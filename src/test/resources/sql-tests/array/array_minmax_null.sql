-- array_min / array_max skip nulls; NaN ordering; empty and all-null arrays.

query
SELECT array_min(array(3, 1, 2)), array_max(array(3, 1, 2)),
       array_min(array(NULL, 5, NULL)), array_max(array(NULL, 5, NULL))

query
SELECT array_min(array(NULL, NULL)), array_max(CAST(array() AS ARRAY<INT>)),
       array_min(CAST(NULL AS ARRAY<INT>))

query
SELECT array_min(array(CAST('NaN' AS DOUBLE), 1.0D)), array_max(array(CAST('NaN' AS DOUBLE), 1.0D)),
       array_max(array(CAST('-Infinity' AS DOUBLE), -1.0D))

query
SELECT array_min(array('b', 'a')), array_max(array('b', 'A'))
