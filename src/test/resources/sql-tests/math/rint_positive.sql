-- rint (IEEE half-even to double) vs positive/negative and csc-free checks.

query
SELECT rint(2.5D), rint(3.5D), rint(-2.5D), rint(2.4D), rint(-2.6D)

query
SELECT rint(0.0D), rint(-0.0D), rint(CAST('NaN' AS DOUBLE)), rint(CAST('Infinity' AS DOUBLE)), rint(NULL)

query
SELECT positive(5), negative(5), positive(-3.5D), negative(-3.5D), negative(0)
