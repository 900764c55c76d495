-- array_append / array_prepend / array_compact over nullable arrays and values.

statement
CREATE OR REPLACE TEMP VIEW t_app AS SELECT * FROM VALUES
  (array(1, 2, 3), 4), (CAST(array() AS ARRAY<INT>), 1),
  (CAST(NULL AS ARRAY<INT>), 1), (array(7, NULL), NULL) AS t(arr, v)

query
SELECT array_append(arr, v), array_append(arr, 99), array_prepend(arr, v) FROM t_app

query
SELECT array_append(array(1, 2, 3), v), array_prepend(array(1, 2, 3), v) FROM t_app

query
SELECT array_compact(array(1, NULL, 2, NULL)), array_compact(CAST(array() AS ARRAY<INT>)),
       array_compact(CAST(NULL AS ARRAY<INT>)), array_compact(array(NULL, NULL))

query
SELECT array_compact(arr) FROM t_app
