-- Spark 4.1 approx_top_k: frequent-items sketch top-k. With inputs far
-- below maxItemsTracked no evictions occur, so counts are exact and
-- deterministic under any partitioning/axis. Distinct frequencies keep
-- the output order total.

statement
CREATE OR REPLACE TEMP VIEW tk AS SELECT * FROM VALUES
  ('a'), ('a'), ('a'), ('a'), ('b'), ('b'), ('b'), ('c'), ('c'), ('d')
  AS t(w)

query
SELECT approx_top_k(w, 3) FROM tk

query
SELECT approx_top_k(w, 2, 100) FROM tk

query
SELECT approx_top_k_estimate(approx_top_k_accumulate(w, 100), 3) FROM tk

-- grouped sketches: one per group, k=1 winner each (ints exercise the
-- non-string item type path)
statement
CREATE OR REPLACE TEMP VIEW tkg AS SELECT * FROM VALUES
  ('g1', 7), ('g1', 7), ('g1', 8), ('g2', 9), ('g2', 5), ('g2', 5)
  AS t(g, v)

query
SELECT g, approx_top_k(v, 1) FROM tkg GROUP BY g ORDER BY g
