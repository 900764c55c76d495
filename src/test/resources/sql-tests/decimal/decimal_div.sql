-- Decimal division: ANSI divide-by-zero throws; try_divide is NULL-safe.

statement
CREATE OR REPLACE TEMP VIEW ddiv AS SELECT * FROM VALUES
  (CAST(1.00 AS DECIMAL(6,2)), CAST(0.00 AS DECIMAL(6,2))),
  (CAST(7.50 AS DECIMAL(6,2)), CAST(2.50 AS DECIMAL(6,2))) AS t(num, den)

query
SELECT num / den FROM ddiv WHERE den <> 0

query
SELECT try_divide(num, den) FROM ddiv

query
SELECT num div 1, CAST(num AS INT) div 2 FROM ddiv

query expect_error(divide_by_zero)
SELECT num / den FROM ddiv WHERE den = 0
