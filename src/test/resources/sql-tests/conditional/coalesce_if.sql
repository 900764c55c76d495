-- coalesce / if / nvl family / nullif / greatest / least over NULLs.

statement
CREATE OR REPLACE TEMP VIEW ci AS SELECT * FROM VALUES
  (1, NULL, 3), (NULL, NULL, NULL), (7, 8, 9) AS t(a, b, c)

query
SELECT coalesce(a, b, c), coalesce(b, c), coalesce(a) FROM ci

query
SELECT if(a > 5, 'big', 'small'), if(a IS NULL, -1, a) FROM ci

query
SELECT nvl(a, 0), nvl2(a, 'set', 'unset'), ifnull(b, -1), nullif(c, 9) FROM ci

query
SELECT greatest(a, b, c), least(a, b, c) FROM ci
