-- Decimal64 cast semantics under ANSI (default on in Spark 4): the
-- rounding/overflow sites of decimal arithmetic are the casts —
-- double→decimal rounds HALF_UP and errors when the target precision
-- can't hold the value; decimal→decimal rescale likewise. NaN/±Inf cast
-- to decimal is NULL in every mode; TRY_CAST is the null-on-overflow
-- path.

statement
CREATE OR REPLACE TEMP VIEW d64 AS SELECT * FROM VALUES
  (DOUBLE(12.34)), (DOUBLE(0.125)), (DOUBLE(-0.125)), (DOUBLE(2.675)),
  (DOUBLE(-98765.432)), (DOUBLE(0.004999)), (CAST(NULL AS DOUBLE)) AS t(p)

query
SELECT p, CAST(p AS DECIMAL(9,2)) AS d92, TRY_CAST(p AS DECIMAL(6,2)) AS t62 FROM d64

query
SELECT CAST(p AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(7,4)) - CAST(0.05 AS DECIMAL(7,4))) AS net,
       CAST(CAST(p AS DECIMAL(12,2)) AS DECIMAL(14,4)) AS up,
       CAST(CAST(p AS DECIMAL(12,4)) AS DECIMAL(8,1)) AS down
FROM d64

query
SELECT CAST(DOUBLE('NaN') AS DECIMAL(5,2)) AS nan_null,
       CAST(DOUBLE('Infinity') AS DECIMAL(5,2)) AS inf_null,
       CAST(DOUBLE('-Infinity') AS DECIMAL(5,2)) AS ninf_null

query
SELECT TRY_CAST(DOUBLE(99999.999) AS DECIMAL(5,2)) AS try_ovf_null,
       TRY_CAST(CAST(99999.99 AS DECIMAL(7,2)) AS DECIMAL(4,2)) AS try_rescale_null

query expect_error(decimal_overflow)
SELECT CAST(DOUBLE(99999.999) AS DECIMAL(5,2))

query expect_error(decimal_overflow)
SELECT CAST(p AS DECIMAL(4,2)) FROM d64 WHERE p < -90000

query expect_error(decimal_overflow)
SELECT CAST(CAST(p AS DECIMAL(12,2)) AS DECIMAL(6,2)) FROM d64 WHERE p < -90000
