-- exp/expm1: precision near zero, overflow to Infinity, underflow to 0.

query
SELECT exp(0.0D), exp(1.0D), exp(-0.0D), expm1(0.0D), expm1(1e-10)

query
SELECT exp(710.0D), exp(-746.0D), exp(CAST('-Infinity' AS DOUBLE)), exp(CAST('NaN' AS DOUBLE))

query
SELECT expm1(-1e-15) <> 0.0D OR expm1(-1e-15) = 0.0D, abs(expm1(1e-12) - 1e-12) < 1e-20

query
SELECT exp(NULL), expm1(NULL), expm1(CAST('Infinity' AS DOUBLE))
