-- Predicate surface: IN (incl. the NOT IN + NULL trap), BETWEEN, LIKE,
-- RLIKE, null-safe equality.

statement
CREATE OR REPLACE TEMP VIEW preds AS SELECT * FROM VALUES
  (1, 'apple'), (2, 'banana'), (3, NULL), (NULL, 'cherry') AS t(n, s)

query
SELECT n, n IN (1, 3), n NOT IN (1, 3) FROM preds

query
SELECT n, n IN (1, NULL) AS in_with_null, n NOT IN (1, NULL) AS notin_with_null FROM preds

query
SELECT n, n BETWEEN 1 AND 2, n NOT BETWEEN 1 AND 2 FROM preds

query
SELECT s, s LIKE 'a%', s LIKE '%an%', s LIKE '_pple', s RLIKE '^[ab]' FROM preds

query
SELECT n, n <=> NULL AS nullsafe_eq_null, NULL <=> NULL AS null_both FROM preds
