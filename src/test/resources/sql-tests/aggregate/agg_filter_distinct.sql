-- count/count DISTINCT/FILTER clauses; NULL handling in counts.

statement
CREATE OR REPLACE TEMP VIEW afd AS SELECT * FROM VALUES
  ('x', 1, 10), ('x', 1, 20), ('x', 2, NULL),
  ('y', 3, 40), ('y', NULL, 50) AS t(g, k, v)

query
SELECT g, count(*), count(v), count(k), count(DISTINCT k) FROM afd GROUP BY g

query
SELECT g, count(*) FILTER (WHERE v > 15), sum(v) FILTER (WHERE k = 1) FROM afd GROUP BY g

query
SELECT count(DISTINCT k) FILTER (WHERE v IS NOT NULL) FROM afd

query
SELECT g, sum(DISTINCT k), avg(DISTINCT k) FROM afd GROUP BY g
