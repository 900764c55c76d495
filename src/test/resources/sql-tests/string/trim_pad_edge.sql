-- trim with custom char sets; pad truncation and empty-pad semantics.

query
SELECT trim(BOTH 'xy' FROM 'xyhixyx'), trim(LEADING 'x' FROM 'xxhix'), trim(TRAILING 'x' FROM 'xxhix')

query
SELECT lpad('hi', 5, 'ab'), lpad('hi', 1, 'ab'), lpad('hi', 5, ''), rpad('hi', 5, 'ab'), rpad('hi', 0, 'z')

query
SELECT lpad('hi', 5), rpad('hi', 5) || '|'

query
SELECT ltrim('xx', 'xxhixx'), rtrim('xx', 'xxhixx')
