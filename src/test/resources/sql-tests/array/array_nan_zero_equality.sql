-- Array membership/set-op equality treats NaN as equal to itself and
-- 0.0 as equal to -0.0 (Spark's normalized ordering), unlike raw double
-- comparison where NaN <> NaN.

statement
CREATE OR REPLACE TEMP VIEW t_nz AS
SELECT array(CAST('NaN' AS DOUBLE), 0.0D, 1.0D) AS a,
       array(CAST('NaN' AS DOUBLE), -0.0D, 2.0D) AS b

query
SELECT array_contains(a, CAST('NaN' AS DOUBLE)),
       array_position(a, CAST('NaN' AS DOUBLE)),
       CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE) FROM t_nz

query
SELECT array_contains(a, -0.0D), array_position(b, 0.0D) FROM t_nz

query
SELECT array_distinct(array(CAST('NaN' AS DOUBLE), CAST('NaN' AS DOUBLE),
                            0.0D, -0.0D)),
       array_union(array(0.0D), array(-0.0D))

query
SELECT array_intersect(a, b), array_except(a, b), arrays_overlap(a, b)
  FROM t_nz

query
SELECT array_min(array(CAST('NaN' AS DOUBLE), 1.0D)),
       array_max(array(CAST('NaN' AS DOUBLE), 1.0D)),
       array_sort(array(CAST('NaN' AS DOUBLE), 1.0D,
                        CAST('Infinity' AS DOUBLE)))
