-- aggregate/reduce folds: running state + finish lambda, null element
-- handling inside the merge lambda, zip_with length mismatch pads with
-- NULL, transform exposes the element index.

statement
CREATE OR REPLACE TEMP VIEW t_ho AS
SELECT array(1, 2, 3, 4) AS a, array(10, 20) AS b,
       array(1, NULL, 3) AS withnull

query
SELECT aggregate(a, 0, (acc, x) -> acc + x),
       aggregate(a, 1, (acc, x) -> acc * x),
       aggregate(a, 0, (acc, x) -> acc + x, acc -> acc * 10) FROM t_ho

query
SELECT reduce(a, named_struct('s', 0, 'n', 0),
              (acc, x) -> named_struct('s', acc.s + x, 'n', acc.n + 1),
              acc -> acc.s / acc.n) FROM t_ho

query
SELECT aggregate(withnull, 0, (acc, x) -> acc + coalesce(x, 0)),
       aggregate(withnull, 0, (acc, x) -> acc + x) FROM t_ho

query
SELECT zip_with(a, b, (x, y) -> coalesce(x, 0) + coalesce(y, 0)),
       zip_with(b, a, (x, y) -> struct(x, y)) FROM t_ho

query
SELECT transform(a, (x, i) -> x * i), transform(b, x -> x + 1),
       filter(a, (x, i) -> i % 2 = 0) FROM t_ho
