-- ceil/floor with a target-scale argument (Spark 3.3+ two-arg forms):
-- positive scale keeps fraction digits, negative scale zeroes integer
-- digits, result precision follows Spark's decimal scale rules.

statement
CREATE OR REPLACE TEMP VIEW t_cfs AS SELECT * FROM VALUES
  (3.14159BD), (-3.14159BD), (12345.678BD), (-12345.678BD), (0.0BD)
  AS t(d)

query
SELECT d, ceil(d, 2), floor(d, 2), ceiling(d, 2) FROM t_cfs

query
SELECT d, ceil(d, 0), floor(d, 0) FROM t_cfs

query
SELECT d, ceil(d, -2), floor(d, -2) FROM t_cfs

query
SELECT ceil(CAST(12345 AS BIGINT), -3), floor(CAST(12345 AS BIGINT), -3),
       ceil(2.5D), floor(-2.5D)

query
SELECT ceil(NULL, 1), floor(CAST(NULL AS DECIMAL(10,2)), -1)
