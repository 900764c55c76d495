-- sqrt of negatives is NaN; cbrt handles negatives; infinity propagation.

query
SELECT sqrt(4.0D), sqrt(0.0D), sqrt(-0.0D), sqrt(-4.0D), sqrt(CAST('Infinity' AS DOUBLE))

query
SELECT cbrt(27.0D), cbrt(-27.0D), cbrt(0.0D), cbrt(-0.0D), cbrt(NULL)

query
SELECT sqrt(2.0D) * sqrt(2.0D), cbrt(CAST('-Infinity' AS DOUBLE))

statement
CREATE OR REPLACE TEMP VIEW t_rt AS SELECT * FROM VALUES (16.0D), (-16.0D), (1e308), (NULL) AS t(x)

query
SELECT x, sqrt(x), cbrt(x) FROM t_rt
