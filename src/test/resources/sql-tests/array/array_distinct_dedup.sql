-- array_distinct keeps first occurrence order; NaN/null dedup semantics.

query
SELECT array_distinct(array(3, 1, 3, 2, 1)), array_distinct(array(NULL, 1, NULL)),
       array_distinct(CAST(array() AS ARRAY<INT>)), array_distinct(CAST(NULL AS ARRAY<INT>))

query
SELECT array_distinct(array('b', 'a', 'b')), array_distinct(array(CAST('NaN' AS DOUBLE), CAST('NaN' AS DOUBLE), 1.0D))

query
SELECT array_distinct(array(-0.0D, 0.0D)), size(array_distinct(array(-0.0D, 0.0D)))
