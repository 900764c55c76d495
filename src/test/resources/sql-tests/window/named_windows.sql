-- WINDOW clause: one definition shared by several functions.

statement
CREATE OR REPLACE TEMP VIEW nw AS SELECT * FROM VALUES
  ('a', 1, 10.0D), ('a', 2, 20.0D), ('a', 3, 15.0D), ('b', 1, 5.0D) AS t(g, seq, v)

query
SELECT g, seq, rank() OVER w, sum(v) OVER w, avg(v) OVER w FROM nw WINDOW w AS (PARTITION BY g ORDER BY seq)

query
SELECT g, seq,
  sum(v) OVER (PARTITION BY g) AS total,
  v / sum(v) OVER (PARTITION BY g) AS share
FROM nw

query
SELECT g, seq, count(*) OVER w1, row_number() OVER w2
FROM nw WINDOW w1 AS (PARTITION BY g), w2 AS (PARTITION BY g ORDER BY v DESC)
