-- Rank-limit filter shapes (the partial WindowGroupLimit pushdown /
-- columnar group-limit probe surface): rn = 1 and rn <= k subquery
-- filters, tie behavior across the rank family, desc + nulls orderings.

statement
CREATE OR REPLACE TEMP VIEW gl AS SELECT * FROM VALUES
  ('u1', 'click', 10, 100), ('u1', 'click', 20, 101), ('u1', 'view', 15, 102),
  ('u2', 'click', 20, 103), ('u2', 'click', 20, 104), ('u2', 'view', NULL, 105),
  ('u3', 'view', 5, 106), ('u3', 'view', 5, 107), ('u3', 'view', 7, 108)
  AS t(u, e, v, id)

query
SELECT u, e, v, id FROM (
  SELECT u, e, v, id, row_number() OVER (PARTITION BY u, e ORDER BY v DESC, id DESC) AS rn
  FROM gl) WHERE rn = 1 ORDER BY u, e

query
SELECT u, v, id FROM (
  SELECT u, v, id, row_number() OVER (PARTITION BY u ORDER BY v ASC NULLS FIRST, id) AS rn
  FROM gl) WHERE rn <= 2 ORDER BY u, id

query
SELECT u, v, id, rk FROM (
  SELECT u, v, id, rank() OVER (PARTITION BY u ORDER BY v DESC NULLS LAST) AS rk
  FROM gl) WHERE rk <= 2 ORDER BY u, id

query
SELECT u, v, id, dr FROM (
  SELECT u, v, id, dense_rank() OVER (PARTITION BY u ORDER BY v) AS dr
  FROM gl) WHERE dr = 1 ORDER BY u, id

query
SELECT e, n FROM (
  SELECT e, count(*) AS n, row_number() OVER (ORDER BY count(*) DESC, e) AS rn
  FROM gl GROUP BY e) WHERE rn = 1
