-- round/bround at positive, zero, and negative scales; ceil/floor with
-- target scale; sign conventions of % vs pmod.

statement
CREATE OR REPLACE TEMP VIEW rnd AS SELECT * FROM VALUES
  (2.5D), (3.5D), (-2.5D), (2.45D), (1234.567D) AS t(x)

query
SELECT x, round(x, 0), bround(x, 0) FROM rnd

query
SELECT x, round(x, 1), bround(x, 1), round(x, -2) FROM rnd

query
SELECT x, ceil(x), floor(x), ceiling(x) FROM rnd

query
SELECT ceil(CAST(12345.678 AS DECIMAL(10,3)), 1), floor(CAST(12345.678 AS DECIMAL(10,3)), 1)

query
SELECT (-7) % 3, pmod(-7, 3), 7 % -3, pmod(7, -3)
