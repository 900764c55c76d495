-- trim/ltrim/rtrim with custom trim character sets; btrim.

query
SELECT trim('  pad  '), ltrim('  pad  '), rtrim('  pad  '), trim(''), trim(NULL)

query
SELECT trim(BOTH 'x' FROM 'xxhixx'), trim(LEADING 'x' FROM 'xxhixx'), trim(TRAILING 'x' FROM 'xxhixx')

query
SELECT btrim('xyhixy', 'xy'), btrim('  hi  '), ltrim('xy', 'xyhixy'), rtrim('xy', 'xyhixy')

query
SELECT trim(BOTH FROM '  a  '), btrim('aaa', 'a'), trim('x' FROM NULL)
