-- Numeric cast matrix over boundary values (NaN/Infinity/min/max).
-- Surface matched to reference expressions/cast/cast.sql; re-authored.

statement
CREATE OR REPLACE TEMP VIEW cast_num AS SELECT * FROM VALUES
  (1, 1L, CAST(1.5 AS FLOAT), 1.5D),
  (0, 0L, CAST(0.0 AS FLOAT), 0.0D),
  (NULL, NULL, NULL, NULL),
  (-1, -1L, CAST(-1.5 AS FLOAT), -1.5D),
  (2147483647, 9223372036854775807L, CAST('NaN' AS FLOAT), CAST('Infinity' AS DOUBLE))
  AS t(i, l, f, d)

query
SELECT CAST(i AS BIGINT), CAST(i AS DOUBLE), CAST(i AS STRING) FROM cast_num

query
SELECT CAST(l AS DOUBLE), CAST(l AS STRING) FROM cast_num

query
SELECT CAST(f AS DOUBLE), CAST(f AS STRING), CAST(d AS FLOAT), CAST(d AS STRING) FROM cast_num

query
SELECT TRY_CAST(f AS INT) AS fi, TRY_CAST(d AS BIGINT) AS dl FROM cast_num

query expect_error(overflow)
SELECT CAST(l AS INT) FROM cast_num WHERE l = 9223372036854775807L

query expect_error(invalid_input)
SELECT CAST(d AS BIGINT) FROM cast_num WHERE d = CAST('Infinity' AS DOUBLE)
