-- Ordered-set / positional aggregates: mode, percentile family, median.

statement
CREATE OR REPLACE TEMP VIEW mp2 AS SELECT * FROM VALUES
  ('a', 1.0D), ('a', 2.0D), ('a', 2.0D), ('a', 100.0D),
  ('b', 5.0D), ('b', 5.0D), ('b', 7.0D) AS t(g, v)

query
SELECT g, mode(v), median(v) FROM mp2 GROUP BY g

query
SELECT g, percentile(v, 0.5), round(percentile(v, 0.25), 6) FROM mp2 GROUP BY g

query
SELECT g, percentile_approx(v, 0.5, 10000), approx_count_distinct(v) FROM mp2 GROUP BY g

query
SELECT g, min_by(v, v), max_by(v, v), any_value(g) FROM mp2 GROUP BY g

query
SELECT g, count_if(v > 4), bool_and(v > 0), bool_or(v > 50), every(v > 0), some(v > 50) FROM mp2 GROUP BY g
