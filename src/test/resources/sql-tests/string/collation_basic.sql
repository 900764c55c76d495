-- Collation-aware comparison (Spark 4 COLLATE).

query
SELECT 'ABC' COLLATE UTF8_LCASE = 'abc', 'ABC' = 'abc'

query
SELECT collation('x' COLLATE UTF8_LCASE), collation('x')

query
SELECT count(DISTINCT c) FROM VALUES ('a'), ('A'), ('b') AS t(c)

query
SELECT count(DISTINCT c COLLATE UTF8_LCASE) FROM VALUES ('a'), ('A'), ('b') AS t(c)

query
SELECT max(c COLLATE UTF8_LCASE), min(c COLLATE UTF8_LCASE) FROM VALUES ('abc'), ('ABD') AS t(c)
