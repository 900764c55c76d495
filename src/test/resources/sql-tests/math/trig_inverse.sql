-- Inverse trig: in-domain values, out-of-domain -> NaN, atan2 quadrants.

statement
CREATE OR REPLACE TEMP VIEW trig AS SELECT * FROM VALUES
  (-1.0D), (-0.5D), (0.0D), (0.5D), (1.0D), (2.0D) AS t(x)

query
SELECT x, round(asin(x), 10), round(acos(x), 10), round(atan(x), 10) FROM trig

query
SELECT x, isnan(asin(x)), isnan(acos(x)) FROM trig

query
SELECT round(atan2(1, 1), 10), round(atan2(1, -1), 10), round(atan2(-1, 1), 10), round(atan2(-1, -1), 10), atan2(0, 0)

query
SELECT round(asinh(1.5D), 10), round(acosh(1.5D), 10), round(atanh(0.5D), 10), isnan(acosh(0.5D))
