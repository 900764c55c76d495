-- rint: round-half-even to a DOUBLE (unlike round's half-up to a
-- literal-scale decimal); ties go to the even neighbor on both signs.

query
SELECT rint(2.5D), rint(3.5D), rint(-2.5D), rint(-3.5D)

query
SELECT rint(2.4D), rint(2.6D), rint(-0.5D), rint(0.5D)

query
SELECT rint(2.5D) = round(2.5D, 0), rint(3.5D) = round(3.5D, 0)

query
SELECT rint(1e18D), rint(-0.0D), rint(CAST('NaN' AS DOUBLE)),
       rint(CAST('Infinity' AS DOUBLE)), rint(NULL)
