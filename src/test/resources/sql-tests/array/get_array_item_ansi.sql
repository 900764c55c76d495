-- a[i] subscript: 0-based, ANSI errors on out-of-bounds, NULL index.

statement
CREATE OR REPLACE TEMP VIEW t_idx AS SELECT * FROM VALUES
  (array(10, 20, 30), 0), (array(10, 20, 30), 2), (array(NULL, 5), 0) AS t(a, i)

query
SELECT a[0], a[i], a[size(a) - 1] FROM t_idx

query
SELECT array(1, 2)[CAST(NULL AS INT)]

query expect_error(index_out_of_bounds)
SELECT array(1, 2)[5]

query expect_error(negative_index)
SELECT array(1, 2)[-1]
