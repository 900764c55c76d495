-- Datasketches HLL: build, estimate, union — the distributed
-- cardinality sketch path (exact estimates are deterministic for a
-- fixed lgK and input set).

statement
CREATE OR REPLACE TEMP VIEW hll AS SELECT * FROM VALUES
  ('a', 1), ('a', 2), ('a', 2), ('a', 3), ('b', 10), ('b', 20) AS t(g, v)

query
SELECT g, hll_sketch_estimate(hll_sketch_agg(v)) FROM hll GROUP BY g

query
SELECT hll_sketch_estimate(hll_sketch_agg(v, 14)) FROM hll

query
SELECT hll_sketch_estimate(hll_union_agg(sk)) FROM (SELECT g, hll_sketch_agg(v) AS sk FROM hll GROUP BY g)

query
SELECT g, approx_count_distinct(v), count(DISTINCT v) FROM hll GROUP BY g
