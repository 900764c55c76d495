-- Correlated EXISTS / IN subqueries.

statement
CREATE OR REPLACE TEMP VIEW outer_t AS SELECT * FROM VALUES
  (1, 'x'), (2, 'y'), (3, 'z') AS t(id, tag)

statement
CREATE OR REPLACE TEMP VIEW inner_t AS SELECT * FROM VALUES
  (1, 100), (1, 200), (3, 50) AS t(ref, amt)

query
SELECT id, tag FROM outer_t o WHERE EXISTS (SELECT 1 FROM inner_t i WHERE i.ref = o.id)

query
SELECT id, tag FROM outer_t o WHERE NOT EXISTS (SELECT 1 FROM inner_t i WHERE i.ref = o.id)

query
SELECT id, tag FROM outer_t WHERE id IN (SELECT ref FROM inner_t WHERE amt > 75)

query
SELECT id, (SELECT sum(amt) FROM inner_t i WHERE i.ref = outer_t.id) AS total FROM outer_t

query
SELECT id, tag FROM outer_t o WHERE EXISTS (SELECT 1 FROM inner_t i WHERE i.ref = o.id AND i.amt > (SELECT avg(amt) FROM inner_t))
