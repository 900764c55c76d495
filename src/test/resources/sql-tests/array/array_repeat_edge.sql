-- array_repeat with zero/negative counts and null elements.

query
SELECT array_repeat('x', 3), array_repeat(7, 1), array_repeat(NULL, 2)

query
SELECT array_repeat('x', 0), array_repeat('x', -1), array_repeat('x', CAST(NULL AS INT))

statement
CREATE OR REPLACE TEMP VIEW t_rep AS SELECT * FROM VALUES (2, 'a'), (0, 'b'), (-3, 'c') AS t(n, s)

query
SELECT n, array_repeat(s, n), size(array_repeat(s, n)) FROM t_rep
