-- Inline VALUES tables with expressions and NULL typing.

query
SELECT * FROM VALUES (1, 'a'), (2, upper('b')), (1 + 2, NULL) AS t(n, s)

query
SELECT n, typeof(n), typeof(s) FROM VALUES (1, NULL) AS t(n, s)

query
SELECT * FROM VALUES (array(1, 2)), (array()) AS t(a)

query
SELECT t.* FROM (VALUES (1, 2), (3, 4)) AS t(a, b) WHERE a < b
