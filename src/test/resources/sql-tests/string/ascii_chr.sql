-- ascii (first codepoint) and chr (codepoint -> char) round trips.

query
SELECT ascii('A'), ascii('abc'), ascii(''), ascii(NULL), ascii('0')

query
SELECT chr(65), chr(97), chr(48), chr(NULL)

query
SELECT chr(ascii('Q')), ascii(chr(120)), chr(256 + 65), chr(0)

query
SELECT ascii('€'), ascii('日'), chr(8364)
