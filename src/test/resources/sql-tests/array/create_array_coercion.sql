-- array() construction: element type coercion across int/decimal/string/null.

query
SELECT array(1, 2.5, 3), array(1, CAST(2 AS BIGINT)), array('a', '1')

query
SELECT array(NULL, NULL), array(NULL, 1), array(DATE '2024-01-01', NULL)

query
SELECT array(array(1), array(2, 3)), array(named_struct('a', 1), named_struct('a', 2))

query
SELECT array(CAST(1 AS TINYINT), CAST(2 AS SMALLINT), 3, CAST(4 AS BIGINT))
