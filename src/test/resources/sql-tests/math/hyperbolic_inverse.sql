-- sinh/cosh/tanh and asinh/acosh/atanh domains and round-trips.

query
SELECT sinh(0.0D), cosh(0.0D), tanh(0.0D), sinh(-0.0D)

query
SELECT asinh(sinh(1.5D)) - 1.5D < 1e-12, acosh(cosh(1.5D)) - 1.5D < 1e-12,
       abs(atanh(tanh(0.5D)) - 0.5D) < 1e-12

query
SELECT acosh(0.5D), atanh(1.0D), atanh(-1.0D), atanh(2.0D)

query
SELECT tanh(CAST('Infinity' AS DOUBLE)), cosh(CAST('-Infinity' AS DOUBLE)), sinh(NULL)
