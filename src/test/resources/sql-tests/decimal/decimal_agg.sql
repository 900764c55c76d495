-- Aggregates over decimals: exact sums, avg scale, all-NULL groups.

statement
CREATE OR REPLACE TEMP VIEW dagg AS SELECT * FROM VALUES
  ('a', CAST(0.10 AS DECIMAL(10,2))), ('a', CAST(0.20 AS DECIMAL(10,2))),
  ('b', CAST(99999999.99 AS DECIMAL(10,2))), ('b', CAST(0.01 AS DECIMAL(10,2))),
  ('c', NULL) AS t(g, v)

query
SELECT g, CAST(sum(v) AS STRING), CAST(avg(v) AS STRING) FROM dagg GROUP BY g

query
SELECT g, CAST(min(v) AS STRING), CAST(max(v) AS STRING), count(v) FROM dagg GROUP BY g

query
SELECT CAST(sum(v) AS STRING) FROM dagg
