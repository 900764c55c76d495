-- Deep access: arrays of structs, struct of arrays, dot after explode.

statement
CREATE OR REPLACE TEMP VIEW nest AS SELECT * FROM VALUES
  (1, array(named_struct('name', 'n1', 'score', 10), named_struct('name', 'n2', 'score', 20))),
  (2, array(named_struct('name', 'n3', 'score', 30))) AS t(id, items)

query
SELECT id, items[0].name, items[0].score, size(items) FROM nest

query
SELECT id, item.name, item.score FROM nest LATERAL VIEW explode(items) AS item

query
SELECT id, transform(items, x -> x.score * 2) FROM nest

query
SELECT id, items.name, items.score FROM nest

query
SELECT named_struct('inner', named_struct('deep', 42)).inner.deep
