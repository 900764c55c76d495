-- listagg / string_agg ordered string concatenation aggregates.

statement
CREATE OR REPLACE TEMP VIEW la AS SELECT * FROM VALUES
  ('g1', 'b'), ('g1', 'a'), ('g1', 'c'), ('g2', 'z') AS t(g, s)

query
SELECT g, listagg(s, ',') WITHIN GROUP (ORDER BY s) FROM la GROUP BY g

query
SELECT g, string_agg(s, '|') WITHIN GROUP (ORDER BY s DESC) FROM la GROUP BY g

query
SELECT listagg(DISTINCT s, '-') WITHIN GROUP (ORDER BY s) FROM la

query
SELECT g, array_join(array_sort(collect_list(s)), ',') FROM la GROUP BY g
