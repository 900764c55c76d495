-- LIKE with ESCAPE, ILIKE, like_all/like_any quantifiers.

statement
CREATE OR REPLACE TEMP VIEW le AS SELECT * FROM VALUES
  ('100%'), ('100x'), ('a_b'), ('axb'), ('ABC') AS t(s)

query
SELECT s, s LIKE '100!%' ESCAPE '!', s LIKE 'a!_b' ESCAPE '!' FROM le

query
SELECT s, s ILIKE 'abc', s ILIKE 'A%' FROM le

query
SELECT s FROM le WHERE s LIKE ALL ('%0%', '1%')

query
SELECT s FROM le WHERE s LIKE ANY ('a\\_b', 'ABC')
