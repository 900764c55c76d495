-- Set-like array operations; results sorted for determinism.

statement
CREATE OR REPLACE TEMP VIEW aso AS SELECT * FROM VALUES
  (array(1, 2, 2, 3), array(2, 3, 4)),
  (array(1, 1), CAST(array() AS ARRAY<INT>)),
  (CAST(NULL AS ARRAY<INT>), array(9)) AS t(x, y)

query
SELECT array_sort(array_distinct(x)), array_sort(array_union(x, y)) FROM aso

query
SELECT array_sort(array_intersect(x, y)), array_sort(array_except(x, y)) FROM aso

query
SELECT arrays_overlap(x, y), array_sort(array_remove(x, 2)) FROM aso

query
SELECT array_sort(array_compact(array(1, NULL, 2, NULL))), flatten(array(array(1), array(2, 3)))
