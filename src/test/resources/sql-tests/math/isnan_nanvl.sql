-- isnan / nanvl on NaN, infinities, nulls.

statement
CREATE OR REPLACE TEMP VIEW t_nan AS SELECT * FROM VALUES
  (CAST('NaN' AS DOUBLE)), (1.5D), (CAST('Infinity' AS DOUBLE)), (NULL) AS t(x)

query
SELECT x, isnan(x), nanvl(x, -1.0D) FROM t_nan

query
SELECT isnan(CAST('NaN' AS FLOAT)), isnan(0.0D / 1.0D), nanvl(CAST('NaN' AS DOUBLE), NULL)

query
SELECT isnan(NULL), nanvl(1.0D, 2.0D), nanvl(NULL, 2.0D)
