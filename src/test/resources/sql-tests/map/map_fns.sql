-- Map surface: construction, keys/values, lookup, membership, concat,
-- str_to_map. Map columns keep insertion order -> deterministic output.

statement
CREATE OR REPLACE TEMP VIEW mp AS SELECT map('a', 1, 'b', 2) AS m, 'a' AS k
UNION ALL SELECT map('z', 26), 'q'

query
SELECT m, map_keys(m), map_values(m), size(m) FROM mp

query
SELECT m, k, element_at(m, k), m[k], map_contains_key(m, 'b') FROM mp

query
SELECT map_from_arrays(array('x', 'y'), array(7, 8)), map_from_entries(array(struct('p', 1), struct('q', 2)))

query
SELECT map_concat(map('a', 1), map('b', 2)), str_to_map('k1:1,k2:2', ',', ':'), map_entries(map('e', 9))

query
SELECT transform_keys(map('a', 1, 'b', 2), (k, v) -> upper(k)), transform_values(map('a', 1, 'b', 2), (k, v) -> v * 10)
