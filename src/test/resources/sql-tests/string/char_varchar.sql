-- CHAR(n) pad semantics and VARCHAR(n) length enforcement.

query
SELECT CAST('ab' AS CHAR(5)), length(CAST('ab' AS CHAR(5))), CAST('ab' AS CHAR(5)) = 'ab   '

query
SELECT CAST('abc' AS VARCHAR(5)), length(CAST('abc' AS VARCHAR(5)))

query
SELECT CAST(CAST('ab' AS CHAR(5)) AS STRING) || '|'

-- in a bare cast (no table schema) varchar length is not enforced;
-- the string passes through
query
SELECT CAST('abcdef' AS VARCHAR(3))
