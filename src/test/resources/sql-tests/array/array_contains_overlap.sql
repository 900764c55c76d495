-- array_contains / arrays_overlap three-valued logic with NULL elements.

statement
CREATE OR REPLACE TEMP VIEW t_ov AS SELECT * FROM VALUES
  (array(1, 2, 3), array(3, 4)), (array(1, 2), array(4, 5)),
  (array(1, NULL), array(4)), (array(1, NULL), array(NULL)),
  (CAST(array() AS ARRAY<INT>), array(1)),
  (CAST(NULL AS ARRAY<INT>), array(1)) AS t(a, b)

query
SELECT a, b, arrays_overlap(a, b), arrays_overlap(b, a) FROM t_ov

query
SELECT array_contains(a, 1), array_contains(a, 4), array_contains(a, CAST(NULL AS INT)) FROM t_ov

query
SELECT array_contains(array(1.0D, 2.0D), 2.0D), array_contains(array('x', 'y'), 'z'),
       array_contains(CAST(NULL AS ARRAY<INT>), 1)
