-- hypot: overflow-safe magnitude (naive sqrt(x*x+y*y) overflows at 3e300),
-- infinity dominance over NaN, null propagation.

query
SELECT hypot(3D, 4D), hypot(-3D, -4D), hypot(0D, 0D), hypot(5D, 0D)

query
SELECT hypot(3e300D, 4e300D), hypot(1e-300D, 1e-300D)

query
SELECT hypot(CAST('Infinity' AS DOUBLE), CAST('NaN' AS DOUBLE)),
       hypot(CAST('NaN' AS DOUBLE), CAST('-Infinity' AS DOUBLE)),
       hypot(CAST('NaN' AS DOUBLE), 1D)

query
SELECT hypot(NULL, 3D), hypot(3D, NULL), hypot(NULL, NULL)

query
SELECT hypot(CAST(3 AS INT), CAST(4 AS BIGINT)), hypot(3.0BD, 4.0BD)
