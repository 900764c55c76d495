-- element_at under ANSI (error on out-of-bounds) vs try_element_at; negative indexing.

query
SELECT element_at(array(10, 20, 30), 1), element_at(array(10, 20, 30), 3),
       element_at(array(10, 20, 30), -1), element_at(array(10, 20, 30), -3)

query
SELECT try_element_at(array(10, 20), 5), try_element_at(array(10, 20), -5),
       try_element_at(CAST(NULL AS ARRAY<INT>), 1), try_element_at(array(10), CAST(NULL AS INT))

query
SELECT try_element_at(map(1, 'a'), 1), try_element_at(map(1, 'a'), 2)

query expect_error(out_of_bounds)
SELECT element_at(array(1, 2), 5)

query expect_error(zero_index)
SELECT element_at(array(1, 2), 0)

query
SELECT element_at(map(1, 'a'), 2)
