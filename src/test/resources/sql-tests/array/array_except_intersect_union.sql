-- Set algebra on arrays: except / intersect / union, null and duplicate handling.

statement
CREATE OR REPLACE TEMP VIEW t_set AS SELECT * FROM VALUES
  (array(1, 2, 2, 3), array(2, 4)), (array(1, NULL, 1), array(NULL, 3)),
  (CAST(array() AS ARRAY<INT>), array(1)),
  (array(5), CAST(NULL AS ARRAY<INT>)) AS t(a, b)

query
SELECT array_except(a, b), array_except(b, a) FROM t_set

query
SELECT array_intersect(a, b), array_intersect(b, a) FROM t_set

query
SELECT array_union(a, b), array_union(b, a) FROM t_set

query
SELECT array_union(array(1, 1), array(1)), array_intersect(array(NULL), array(NULL)),
       array_except(array(NULL, 1), array(NULL))
