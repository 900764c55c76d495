-- array_join with and without null replacement.

query
SELECT array_join(array('a', 'b', 'c'), ','), array_join(array('a', NULL, 'c'), ','),
       array_join(array('a', NULL, 'c'), ',', '_'), array_join(CAST(array() AS ARRAY<STRING>), ',')

query
SELECT array_join(CAST(NULL AS ARRAY<STRING>), ','), array_join(array(NULL, NULL), ',', 'x')

statement
CREATE OR REPLACE TEMP VIEW t_aj AS SELECT * FROM VALUES
  (array('x', 'y'), '-'), (array('solo'), '+'), (array(NULL, 'z'), '|') AS t(a, d)

query
SELECT array_join(a, d), array_join(a, d, '?') FROM t_aj
