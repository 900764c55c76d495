-- array_position is 1-based (0 = absent, NULL search value -> NULL); array_remove.

query
SELECT array_position(array(3, 2, 1), 1), array_position(array(3, 2, 1), 7),
       array_position(array(3, NULL, 1), 1), array_position(array(1), CAST(NULL AS INT))

query
SELECT array_remove(array(1, 2, 1, 3), 1), array_remove(array(1, NULL, 1), 1),
       array_remove(array(1, 2), 7), array_remove(array(1, 2), CAST(NULL AS INT))

query
SELECT array_remove(CAST(NULL AS ARRAY<INT>), 1), array_position(CAST(NULL AS ARRAY<INT>), 1)
