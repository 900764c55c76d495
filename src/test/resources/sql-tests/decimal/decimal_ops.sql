-- Decimal arithmetic: result precision/scale, mixed scales, remainder.

statement
CREATE OR REPLACE TEMP VIEW dops AS SELECT * FROM VALUES
  (CAST(10.50 AS DECIMAL(8,2)), CAST(3.125 AS DECIMAL(8,3))),
  (CAST(-2.00 AS DECIMAL(8,2)), CAST(0.500 AS DECIMAL(8,3))),
  (NULL, CAST(1.000 AS DECIMAL(8,3))) AS t(x, y)

query
SELECT x + y, x - y, x * y FROM dops

query
SELECT x / y FROM dops WHERE y <> 0

query
SELECT x % y, mod(x, y) FROM dops WHERE y <> 0

query
SELECT CAST(x + y AS STRING), CAST(x * y AS STRING) FROM dops
