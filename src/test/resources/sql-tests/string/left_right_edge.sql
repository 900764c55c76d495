-- left/right with lengths beyond size, zero, negative, null.

statement
CREATE OR REPLACE TEMP VIEW t_lr AS SELECT * FROM VALUES
  ('abcdef', 3), ('ab', 5), ('abc', 0), ('abc', -2), (NULL, 1), ('abc', NULL) AS t(s, n)

query
SELECT s, n, left(s, n), right(s, n) FROM t_lr

query
SELECT left('日本語です', 2), right('日本語です', 2), left('', 3), right('', 3)
