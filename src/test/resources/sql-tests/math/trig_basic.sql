-- Forward trig + hyperbolics + reciprocal functions.

statement
CREATE OR REPLACE TEMP VIEW tb AS SELECT * FROM VALUES
  (0.0D), (0.5235987755982988D), (1.5707963267948966D), (3.141592653589793D) AS t(x)

query
SELECT x, round(sin(x), 12), round(cos(x), 12), round(tan(least(x, 1.0D)), 12) FROM tb

query
SELECT x, round(sinh(x), 12), round(cosh(x), 12), round(tanh(x), 12) FROM tb

query
SELECT round(cot(1.0D), 12), round(csc(1.0D), 12), round(sec(1.0D), 12)

query
SELECT round(degrees(3.141592653589793D), 9), round(radians(90.0D), 12), round(pi(), 12)
