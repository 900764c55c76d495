-- count_if / any / every / bool_and / bool_or over grouped booleans.

statement
CREATE OR REPLACE TEMP VIEW t_ci AS SELECT * FROM VALUES
  ('a', 1, true), ('a', 5, false), ('a', NULL, true),
  ('b', 2, NULL), ('b', 4, true), ('c', NULL, NULL) AS t(g, x, b)

query
SELECT g, count_if(x > 2), count_if(x IS NULL), count(x), count(*) FROM t_ci GROUP BY g ORDER BY g

query
SELECT g, any(b), every(b), some(b), bool_and(b), bool_or(b) FROM t_ci GROUP BY g ORDER BY g

query
SELECT count_if(x > 0), any(b), every(b) FROM t_ci
