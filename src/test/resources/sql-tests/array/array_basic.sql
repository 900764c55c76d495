-- Array construction, access, membership, slicing.

statement
CREATE OR REPLACE TEMP VIEW arr AS SELECT * FROM VALUES
  (array(3, 1, 2)), (array(5)), (CAST(array() AS ARRAY<INT>)), (NULL) AS t(a)

query
SELECT a, size(a), try_element_at(a, 1), try_element_at(a, 99) FROM arr

query
SELECT a, array_contains(a, 1), array_position(a, 2), array_max(a), array_min(a) FROM arr

query
SELECT a, slice(a, 1, 2), reverse(a), array_sort(a), sort_array(a, false) FROM arr

query
SELECT array(1, 2) || array(3), array_repeat('x', 3), sequence(1, 5), sequence(5, 1, -2)

query expect_error(invalid_index)
SELECT element_at(array(1, 2), 0)
