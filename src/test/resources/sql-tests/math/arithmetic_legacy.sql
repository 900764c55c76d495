-- LEGACY arithmetic: overflow wraps silently (two's complement).
-- Config: spark.sql.ansi.enabled=false

statement
CREATE OR REPLACE TEMP VIEW arithl AS SELECT * FROM VALUES
  (2147483647, 9223372036854775807L), (1, 1L) AS t(i, l)

query
SELECT i + 1, i * 2 FROM arithl WHERE i = 2147483647

query
SELECT l + 1 FROM arithl WHERE l > 1

query
SELECT 1 / 0 IS NULL AS div0_null, CAST(1 AS INT) div 0 IS NULL AS idiv0_null
