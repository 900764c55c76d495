-- Rank family + explicit ROWS/RANGE frames.

statement
CREATE OR REPLACE TEMP VIEW wf AS SELECT * FROM VALUES
  ('a', 1, 10), ('a', 2, 10), ('a', 3, 30), ('b', 1, 5), ('b', 2, 15) AS t(g, seq, v)

query
SELECT g, seq, rank() OVER w, dense_rank() OVER w, row_number() OVER w FROM wf WINDOW w AS (PARTITION BY g ORDER BY v)

query
SELECT g, seq, percent_rank() OVER w, cume_dist() OVER w, ntile(2) OVER w FROM wf WINDOW w AS (PARTITION BY g ORDER BY v)

query
SELECT g, seq, sum(v) OVER (PARTITION BY g ORDER BY seq ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM wf

query
SELECT g, seq, sum(v) OVER (PARTITION BY g ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM wf

query
SELECT g, seq, first(v) OVER w, last(v) OVER (PARTITION BY g ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), nth_value(v, 2) OVER w FROM wf WINDOW w AS (PARTITION BY g ORDER BY seq)
