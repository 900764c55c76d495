-- ANSI: the same decimal sum overflow throws.

statement
CREATE OR REPLACE TEMP VIEW bigdec_a AS
SELECT CAST(99999999999999999999999999999999999999 AS DECIMAL(38,0)) AS v
FROM range(5)

query
SELECT CAST(sum(v) AS STRING) FROM (SELECT CAST(2 AS DECIMAL(38,0)) AS v FROM range(5))

query expect_error(decimal_overflow)
SELECT sum(v) FROM bigdec_a
