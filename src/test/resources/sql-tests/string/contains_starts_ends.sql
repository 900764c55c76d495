-- contains/startswith/endswith on strings including empty-pattern conventions.

statement
CREATE OR REPLACE TEMP VIEW t_match AS SELECT * FROM VALUES
  ('Spark SQL', 'SQL'), ('Spark SQL', 'spark'), ('abc', ''), ('', ''), (NULL, 'a'), ('a', NULL) AS t(s, p)

query
SELECT s, p, contains(s, p), startswith(s, p), endswith(s, p) FROM t_match

query
SELECT contains('abc', 'b'), startswith('abc', 'ab'), endswith('abc', 'bc'),
       contains('abc', 'ABC')

query
SELECT startswith('', 'x'), endswith('x', ''), contains('', '')
