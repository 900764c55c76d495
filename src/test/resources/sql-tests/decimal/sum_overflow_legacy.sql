-- LEGACY: decimal sum overflow returns NULL instead of throwing.
-- Config: spark.sql.ansi.enabled=false

statement
CREATE OR REPLACE TEMP VIEW bigdec AS
SELECT CAST(99999999999999999999999999999999999999 AS DECIMAL(38,0)) AS v
FROM range(5)

query
SELECT sum(v) IS NULL AS overflowed FROM bigdec

query
SELECT sum(v) IS NOT NULL AS fits FROM (SELECT CAST(1 AS DECIMAL(38,0)) AS v FROM range(5))
