-- round (HALF_UP) vs bround (HALF_EVEN, banker's): they differ exactly
-- on ties, on both doubles and decimals, at positive and negative scale.

statement
CREATE OR REPLACE TEMP VIEW t_br AS SELECT * FROM VALUES
  (0.5D, 0.5BD), (1.5D, 1.5BD), (2.5D, 2.5BD), (-0.5D, -0.5BD),
  (-1.5D, -1.5BD), (-2.5D, -2.5BD) AS t(d, dec)

query
SELECT d, round(d, 0), bround(d, 0) FROM t_br

query
SELECT dec, round(dec, 0), bround(dec, 0) FROM t_br

query
SELECT round(2.345D, 2), bround(2.345D, 2),
       round(2.335BD, 2), bround(2.335BD, 2)

query
SELECT round(1250, -2), bround(1250, -2), round(1350, -2), bround(1350, -2)

query
SELECT round(NULL, 1), bround(CAST(NULL AS DOUBLE), 1), bround(3.0D)
