-- lag/lead with offsets and defaults over per-group ordering.

statement
CREATE OR REPLACE TEMP VIEW ll AS SELECT * FROM VALUES
  ('a', 1, 10), ('a', 2, 20), ('a', 3, 30),
  ('b', 1, 100), ('b', 2, 200) AS t(g, seq, v)

query
SELECT g, seq, lag(v) OVER (PARTITION BY g ORDER BY seq), lead(v) OVER (PARTITION BY g ORDER BY seq) FROM ll

query
SELECT g, seq, lag(v, 2, -1) OVER (PARTITION BY g ORDER BY seq), lead(v, 2, -1) OVER (PARTITION BY g ORDER BY seq) FROM ll

query
SELECT g, seq, v - lag(v, 1, 0) OVER (PARTITION BY g ORDER BY seq) AS delta FROM ll
