-- ORDER BY + LIMIT (TakeOrderedAndProject / columnar top-k surface):
-- asc/desc, explicit null placement, ties broken by a unique key,
-- k larger than the row count, LIMIT with OFFSET.

statement
CREATE OR REPLACE TEMP VIEW tk AS SELECT * FROM VALUES
  (1, 5.0, 'b'), (2, CAST('NaN' AS DOUBLE), 'a'), (3, NULL, 'z'),
  (4, -0.0, 'a'), (5, 0.0, NULL), (6, 5.0, 'c'), (7, -3.5, 'A')
  AS t(id, d, s)

query
SELECT id, d FROM tk ORDER BY d DESC, id LIMIT 3

query
SELECT id, d FROM tk ORDER BY d ASC NULLS FIRST, id DESC LIMIT 4

query
SELECT id, s FROM tk ORDER BY s NULLS LAST, id LIMIT 5

query
SELECT id, d FROM tk ORDER BY d, id LIMIT 100

query
SELECT id, d FROM tk ORDER BY d DESC NULLS LAST, id LIMIT 3 OFFSET 2

query
SELECT upper(s) AS su, d * 2 AS dd FROM tk WHERE d IS NOT NULL ORDER BY dd DESC, su NULLS LAST LIMIT 2
