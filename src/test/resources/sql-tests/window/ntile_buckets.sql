-- ntile bucket boundaries when rows do not divide evenly; first/last frames.

statement
CREATE OR REPLACE TEMP VIEW t_nt AS SELECT * FROM VALUES
  (1), (2), (3), (4), (5), (6), (7) AS t(x)

query
SELECT x, ntile(3) OVER (ORDER BY x), ntile(2) OVER (ORDER BY x), ntile(7) OVER (ORDER BY x) FROM t_nt

query
SELECT x, first_value(x) OVER w, last_value(x) OVER w,
       last_value(x) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
FROM t_nt WINDOW w AS (ORDER BY x) ORDER BY x

query
SELECT x, nth_value(x, 2) OVER (ORDER BY x), nth_value(x, 2) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM t_nt ORDER BY x
