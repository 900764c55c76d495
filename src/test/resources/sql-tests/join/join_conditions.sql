-- Join condition varieties: non-equi predicates on top of equi keys,
-- USING vs ON, self-join, full outer with NULL keys.

statement
CREATE OR REPLACE TEMP VIEW jc1 AS SELECT * FROM VALUES
  (1, 10), (2, 20), (3, 30), (NULL, 99) AS t(k, v)

statement
CREATE OR REPLACE TEMP VIEW jc2 AS SELECT * FROM VALUES
  (1, 15), (2, 5), (NULL, 77) AS t(k, w)

query
SELECT a.k, a.v, b.w FROM jc1 a JOIN jc2 b ON a.k = b.k AND a.v < b.w

query
SELECT k, v, w FROM jc1 JOIN jc2 USING (k)

query
SELECT a.k, b.k, a.v, b.w FROM jc1 a FULL OUTER JOIN jc2 b ON a.k = b.k

query
SELECT x.k, y.k FROM jc1 x JOIN jc1 y ON x.k < y.k

query
SELECT a.k, a.v, b.w FROM jc1 a LEFT JOIN jc2 b ON a.k = b.k AND b.w > 10
