-- grouping()/grouping_id() disambiguate rollup NULLs from data NULLs.

statement
CREATE OR REPLACE TEMP VIEW t_gid AS SELECT * FROM VALUES
  ('x', NULL, 1), ('x', 'p', 2), (NULL, 'q', 3), ('y', 'p', 4) AS t(a, b, v)

query
SELECT a, b, sum(v), grouping(a), grouping(b), grouping_id(a, b)
FROM t_gid GROUP BY ROLLUP(a, b) ORDER BY grouping_id(a, b), a, b

query
SELECT a, grouping(a), count(*) FROM t_gid GROUP BY CUBE(a) ORDER BY grouping(a), a
