-- NULL propagation through operators and functions.

statement
CREATE OR REPLACE TEMP VIEW ns AS SELECT * FROM VALUES
  (1, 'x'), (NULL, 'y'), (3, NULL), (NULL, NULL) AS t(n, s)

query
SELECT n + 1, n * 0, concat(s, '!'), upper(s) FROM ns

query
SELECT n = NULL, n <> NULL, NULL = NULL, n <=> NULL FROM ns

query
SELECT count(*), count(n), count(s), count(n + length(s)) FROM ns

query
SELECT coalesce(n, -1) + coalesce(length(s), -10) FROM ns

query
SELECT CASE WHEN n IS NULL AND s IS NULL THEN 'both' WHEN n IS NULL OR s IS NULL THEN 'one' ELSE 'none' END FROM ns
