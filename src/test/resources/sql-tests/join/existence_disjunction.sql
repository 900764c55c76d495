-- Predicate subqueries under disjunctions: RewritePredicateSubquery
-- plans ExistenceJoin (a boolean exists column consumed by the OR
-- filter) instead of a semi join, because the other disjunct keeps
-- non-matching rows alive. Null keys: IN yields NULL (not TRUE), so a
-- null-key row survives only via the other disjunct.

statement
CREATE OR REPLACE TEMP VIEW ex_s AS SELECT * FROM VALUES
  (1, 10, 5.0), (2, 20, 50.0), (3, CAST(NULL AS INT), 60.0),
  (4, 99, 1.0), (5, 10, 2.0), (6, 30, 70.0) AS t(id, k, v)

statement
CREATE OR REPLACE TEMP VIEW ex_b AS SELECT * FROM VALUES
  (10), (10), (30), (77) AS t(bk)

query
SELECT id FROM ex_s WHERE k IN (SELECT bk FROM ex_b) OR v > 45.0 ORDER BY id

query
SELECT id FROM ex_s WHERE EXISTS (SELECT 1 FROM ex_b WHERE bk = k) OR v > 45.0 ORDER BY id

-- both disjuncts are existence joins (two boolean columns)
query
SELECT id FROM ex_s
WHERE k IN (SELECT bk FROM ex_b) OR k IN (SELECT bk + 69 FROM ex_b)
ORDER BY id

-- negated existence under a disjunction: null key makes NOT IN unknown,
-- row 3 survives only via v > 45
query
SELECT id FROM ex_s WHERE k NOT IN (SELECT bk FROM ex_b) OR v > 45.0 ORDER BY id

-- conjunction twin for contrast: plans a plain semi join, same rows as
-- intersecting the predicates
query
SELECT id FROM ex_s WHERE k IN (SELECT bk FROM ex_b) AND v < 45.0 ORDER BY id
