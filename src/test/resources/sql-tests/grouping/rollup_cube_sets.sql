-- Expand operator: rollup, cube, grouping sets, grouping_id.

statement
CREATE OR REPLACE TEMP VIEW gr AS SELECT * FROM VALUES
  ('us', 'a', 10), ('us', 'b', 20), ('eu', 'a', 30), ('eu', 'b', 40) AS t(region, cls, v)

query
SELECT region, cls, sum(v), grouping(region), grouping(cls) FROM gr GROUP BY ROLLUP(region, cls)

query
SELECT region, cls, sum(v), grouping_id(region, cls) FROM gr GROUP BY CUBE(region, cls)

query
SELECT region, cls, sum(v) FROM gr GROUP BY GROUPING SETS ((region), (cls), ())

query
SELECT region, count(DISTINCT cls), sum(v) FROM gr GROUP BY ROLLUP(region)
