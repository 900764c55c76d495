-- asin/acos domain [-1,1]: outside yields NaN (not error), boundary exactness.

query
SELECT asin(0.0D), asin(1.0D), asin(-1.0D), acos(1.0D), acos(-1.0D), acos(0.0D)

query
SELECT asin(1.0000001D), asin(-1.5D), acos(2.0D), acos(CAST('NaN' AS DOUBLE))

statement
CREATE OR REPLACE TEMP VIEW t_dom AS SELECT * FROM VALUES (0.5D), (-0.5D), (0.99D) AS t(x)

query
SELECT x, abs(sin(asin(x)) - x) < 1e-12, abs(asin(x) + acos(x) - pi() / 2.0D) < 1e-12 FROM t_dom

query
SELECT atan(0.0D), atan(CAST('Infinity' AS DOUBLE)), atan(CAST('-Infinity' AS DOUBLE)), atan(NULL)
