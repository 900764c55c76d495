-- Mixed window evaluation kinds in ONE spec: the mixed-kind splitter
-- chains homogeneous graft nodes over one sort (streaming / size-based /
-- deferred RANGE / finite-RANGE ring); results must be invariant.
-- (Spark's parser has no named-window frame refinement, so frame-bearing
-- specs are written out in full — same (PARTITION BY, ORDER BY) spec, so
-- the planner still lands every expression in one WindowExec.)

statement
CREATE OR REPLACE TEMP VIEW mk AS SELECT * FROM VALUES
  ('a', 1, 10), ('a', 2, 10), ('a', 3, 30), ('a', 4, CAST(NULL AS INT)),
  ('b', 1, 5), ('b', 2, 15), ('b', 3, 15), ('c', 1, 7) AS t(g, seq, v)

query
SELECT g, seq, row_number() OVER w AS rn, sum(v) OVER w AS ds,
  lag(seq, 1) OVER w AS prev,
  sum(v) OVER (PARTITION BY g ORDER BY seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
FROM mk WINDOW w AS (PARTITION BY g ORDER BY seq)

query
SELECT g, seq, ntile(3) OVER w AS nt, lead(v, 1) OVER w AS nx,
  count(*) OVER w AS dn,
  min(v) OVER (PARTITION BY g ORDER BY seq
               ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS mn2,
  sum(v) OVER (PARTITION BY g ORDER BY seq
               RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS rr
FROM mk WINDOW w AS (PARTITION BY g ORDER BY seq)

query
SELECT g, seq, percent_rank() OVER w AS pr, cume_dist() OVER w AS cd,
  avg(v) OVER w AS da, rank() OVER w AS rk
FROM mk WINDOW w AS (PARTITION BY g ORDER BY v)
