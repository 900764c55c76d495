-- first/last with ignoreNulls (group-constant values keep them
-- deterministic) and sorted collect_set.

statement
CREATE OR REPLACE TEMP VIEW flc AS SELECT * FROM VALUES
  ('a', 'a-val', 1), ('a', 'a-val', 2), ('a', NULL, 3),
  ('b', 'b-val', 4) AS t(g, tag, n)

query
SELECT g, first(tag, true), last(tag, true) FROM flc GROUP BY g

query
SELECT g, first(g || '!'), last(g || '!') FROM flc GROUP BY g

query
SELECT g, array_join(array_sort(collect_set(n)), ',') FROM flc GROUP BY g

query
SELECT g, array_join(array_sort(collect_list(CAST(n AS STRING))), ',') FROM flc GROUP BY g
