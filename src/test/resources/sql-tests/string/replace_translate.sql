-- replace (substring) vs translate (per-char mapping, extra from-chars deleted).

query
SELECT replace('aabbcc', 'bb', 'XX'), replace('aaa', 'a', ''), replace('abc', '', 'X')

query
SELECT replace('abc', 'x', 'y'), replace(NULL, 'a', 'b'), replace('abc', 'b', NULL)

query
SELECT translate('abcba', 'abc', 'xyz'), translate('abcba', 'abc', 'xy'), translate('abc', '', 'x')

query
SELECT translate('hello', 'el', '3'), translate(NULL, 'a', 'b'), translate('abc', 'a', '')
