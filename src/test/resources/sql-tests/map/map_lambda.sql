-- Higher-order functions over maps.

statement
CREATE OR REPLACE TEMP VIEW ml AS SELECT map('a', 1, 'b', -2, 'c', 3) AS m

query
SELECT map_filter(m, (k, v) -> v > 0) FROM ml

query
SELECT transform_values(m, (k, v) -> abs(v)), transform_keys(m, (k, v) -> concat(k, v)) FROM ml

query
SELECT map_zip_with(map('x', 1, 'y', 2), map('x', 10, 'z', 30), (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0))

query
SELECT aggregate(map_values(m), 0, (acc, v) -> acc + v) FROM ml

query
SELECT array_join(array_sort(map_keys(map_filter(m, (k, v) -> v != -2))), ',') FROM ml
