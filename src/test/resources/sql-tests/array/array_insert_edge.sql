-- array_insert positive/negative positions, gap-filling with nulls, index 0 error.

query
SELECT array_insert(array(1, 2, 3), 2, 9), array_insert(array(1, 2, 3), 1, 9),
       array_insert(array(1, 2, 3), 4, 9)

query
SELECT array_insert(array(1, 2, 3), -1, 9), array_insert(array(1, 2, 3), -4, 9)

query
SELECT array_insert(array(1, 2), 5, 9), array_insert(array(1, 2), -5, 9)

query
SELECT array_insert(array(1, 2), 2, NULL), array_insert(CAST(NULL AS ARRAY<INT>), 1, 5)

query expect_error(position_zero)
SELECT array_insert(array(1, 2), 0, 9)
