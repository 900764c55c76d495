-- sin/cos/tan at multiples of pi/2 (within double ulp) and symmetry laws.

query
SELECT sin(0.0D), cos(0.0D), tan(0.0D), sin(-0.0D)

query
SELECT abs(sin(pi()) - 0.0D) < 1e-15, abs(cos(pi()) + 1.0D) < 1e-15,
       abs(sin(pi() / 2.0D) - 1.0D) < 1e-15

statement
CREATE OR REPLACE TEMP VIEW t_sym AS SELECT * FROM VALUES (0.3D), (1.1D), (2.7D) AS t(x)

query
SELECT x, abs(sin(-x) + sin(x)) < 1e-15, abs(cos(-x) - cos(x)) < 1e-15,
       abs(sin(x) * sin(x) + cos(x) * cos(x) - 1.0D) < 1e-12 FROM t_sym

query
SELECT sin(CAST('Infinity' AS DOUBLE)), cos(CAST('NaN' AS DOUBLE)), tan(NULL)
