-- CASE WHEN: searched and simple forms, NULL branches, missing ELSE.

statement
CREATE OR REPLACE TEMP VIEW cw AS SELECT * FROM VALUES
  (1, 'a'), (2, 'b'), (3, NULL), (NULL, 'd') AS t(n, s)

query
SELECT n, CASE WHEN n < 2 THEN 'small' WHEN n < 3 THEN 'mid' ELSE 'big' END FROM cw

query
SELECT n, CASE WHEN n IS NULL THEN 'null' END AS no_else FROM cw

query
SELECT s, CASE s WHEN 'a' THEN 1 WHEN 'b' THEN 2 END AS simple FROM cw

query
SELECT n, CASE WHEN n > 1 THEN CASE WHEN n > 2 THEN 'deep' ELSE 'shallow' END ELSE 'none' END AS nested FROM cw
