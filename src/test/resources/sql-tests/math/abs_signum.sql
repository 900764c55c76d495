-- abs/signum across integral extremes, doubles, decimals, NaN and signed zero.

statement
CREATE OR REPLACE TEMP VIEW t_abs AS SELECT * FROM VALUES
  (-5, -5.5D), (0, -0.0D), (7, CAST('NaN' AS DOUBLE)),
  (NULL, CAST('-Infinity' AS DOUBLE)) AS t(i, d)

query
SELECT i, abs(i), signum(i), d, abs(d), signum(d) FROM t_abs

query
SELECT abs(CAST(-128 AS SMALLINT)), abs(CAST(-2147483648 AS BIGINT)), abs(-1.5BD), signum(-1.5BD)

query expect_error(tinyint_min_overflow)
SELECT abs(CAST(-128 AS TINYINT))

query
SELECT try_add(abs(-2147483647), 0), abs(interval '-3' day)
