-- pow/power IEEE edge conventions: 0^0, negative base fractional exponent, inf.

query
SELECT pow(2.0D, 10.0D), power(2.0D, -1.0D), pow(0.0D, 0.0D), pow(1.0D, CAST('NaN' AS DOUBLE))

query
SELECT pow(-8.0D, 1.0D / 3.0D), pow(-2.0D, 2.0D), pow(-2.0D, 3.0D), pow(-2.0D, 0.5D)

query
SELECT pow(CAST('Infinity' AS DOUBLE), 0.0D), pow(0.0D, -1.0D), pow(-0.0D, 3.0D)

query
SELECT pow(NULL, 2.0D), pow(2.0D, NULL), pow(CAST('NaN' AS DOUBLE), 0.0D)
