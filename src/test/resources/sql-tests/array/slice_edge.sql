-- slice: 1-based start, negative start counts from the end, length may
-- overrun the array, length 0 gives an empty array, start 0 is an error
-- (SQL arrays have no index 0).

statement
CREATE OR REPLACE TEMP VIEW t_sl AS SELECT array(1, 2, 3, 4, 5) AS a

query
SELECT slice(a, 2, 3), slice(a, 1, 5), slice(a, 5, 1) FROM t_sl

query
SELECT slice(a, -2, 2), slice(a, -5, 3), slice(a, -1, 10) FROM t_sl

query
SELECT slice(a, 2, 0), slice(a, 2, 99), slice(a, 6, 2) FROM t_sl

query expect_error(slice_start_zero)
SELECT slice(a, 0, 2) FROM t_sl

query expect_error(slice_negative_length)
SELECT slice(a, 1, -1) FROM t_sl

query
SELECT slice(CAST(NULL AS ARRAY<INT>), 1, 2), slice(array(), 1, 2),
       slice(array('x', NULL, 'y'), 2, 2)
