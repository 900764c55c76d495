-- Generate operators: explode/posexplode/inline, outer variants.

statement
CREATE OR REPLACE TEMP VIEW gen AS SELECT * FROM VALUES
  (1, array('a', 'b')), (2, array('c')), (3, CAST(array() AS ARRAY<STRING>)), (4, NULL) AS t(id, a)

query
SELECT id, explode(a) FROM gen

query
SELECT id, explode_outer(a) FROM gen

query
SELECT id, posexplode(a) FROM gen

query
SELECT id, posexplode_outer(a) FROM gen

query
SELECT explode(map('k1', 1, 'k2', 2))

query
SELECT inline(array(struct(1, 'a'), struct(2, 'b')))

query
SELECT id, stack(2, 'x', 1, 'y', 2) FROM gen WHERE id = 1
