-- exp/log family at domain boundaries.

statement
CREATE OR REPLACE TEMP VIEW elog AS SELECT * FROM VALUES
  (0.0D), (1.0D), (e()), (-1.0D), (1e308) AS t(x)

query
SELECT x, exp(x) = CAST('Infinity' AS DOUBLE), round(expm1(least(x, 1.0D)), 10) FROM elog

query
SELECT x, ln(x), log10(x), log2(x), log1p(x) FROM elog WHERE x > 0

query
SELECT ln(0.0D), log10(-1.0D), log(2, 8), log(1, 5)

query
SELECT round(power(2, 10), 6), power(0, 0), round(sqrt(2), 10), sqrt(-1) IS NULL OR isnan(sqrt(-1))
