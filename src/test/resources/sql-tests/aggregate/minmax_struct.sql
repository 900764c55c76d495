-- min/max over structs (lexicographic by field order) and arrays.

statement
CREATE OR REPLACE TEMP VIEW mms AS SELECT * FROM VALUES
  ('g', 2, 'b'), ('g', 1, 'z'), ('g', 1, 'a'), ('h', 5, 'q') AS t(g, a, b)

query
SELECT g, min(struct(a, b)), max(struct(a, b)) FROM mms GROUP BY g

query
SELECT g, min(struct(a, b)).b AS b_of_min FROM mms GROUP BY g

query
SELECT min(array(a, length(b))), max(array(a, length(b))) FROM mms
