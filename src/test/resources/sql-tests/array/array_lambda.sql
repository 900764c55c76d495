-- Higher-order functions over arrays.

statement
CREATE OR REPLACE TEMP VIEW hof AS SELECT * FROM VALUES
  (array(1, 2, 3, 4)), (array(-5, 0, 5)), (CAST(array() AS ARRAY<INT>)) AS t(a)

query
SELECT a, transform(a, x -> x * 2), filter(a, x -> x > 1) FROM hof

query
SELECT a, exists(a, x -> x < 0), forall(a, x -> x >= -5) FROM hof

query
SELECT a, aggregate(a, 0, (acc, x) -> acc + x), aggregate(a, 1, (acc, x) -> acc * x, acc -> acc + 100) FROM hof

query
SELECT zip_with(array(1, 2), array(10, 20), (x, y) -> x + y), arrays_zip(array(1, 2), array('a', 'b'))

query
SELECT transform(array('a', 'b'), (x, i) -> concat(x, i)), array_join(transform(array(1, 2), x -> CAST(x AS STRING)), '+')
