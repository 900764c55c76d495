-- Decimal <-> primitive casts; precision/scale changes; ANSI overflow.

statement
CREATE OR REPLACE TEMP VIEW cast_dec AS SELECT * FROM VALUES
  (CAST(123.45 AS DECIMAL(10,2))), (CAST(-0.05 AS DECIMAL(10,2))),
  (CAST(99999999.99 AS DECIMAL(10,2))), (NULL) AS t(dec)

query
SELECT CAST(dec AS DOUBLE), CAST(dec AS STRING) FROM cast_dec

query
SELECT CAST(dec AS INT) FROM cast_dec WHERE dec BETWEEN -1000 AND 1000

query
SELECT CAST(dec AS DECIMAL(12,4)), CAST(dec AS DECIMAL(6,0)) FROM cast_dec WHERE abs(dec) < 1000

query
SELECT TRY_CAST(dec AS DECIMAL(4,2)) FROM cast_dec

query expect_error(decimal_overflow)
SELECT CAST(dec AS DECIMAL(4,2)) FROM cast_dec WHERE dec > 1000
