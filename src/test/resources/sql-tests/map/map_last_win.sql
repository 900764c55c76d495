-- Duplicate-key handling under mapKeyDedupPolicy=LAST_WIN: the later
-- entry silently wins instead of erroring (contrast map_concat_edges.sql
-- / transform_keys.sql, which pin the default EXCEPTION behavior).
-- Config: spark.sql.mapKeyDedupPolicy=LAST_WIN

query
SELECT map_concat(map('k', 1), map('k', 2)) AS concat_last_win

query
SELECT transform_keys(map('a', 1, 'b', 2), (k, v) -> 'same') AS keys_last_win

query
SELECT map_from_arrays(array('x', 'x', 'y'), array(1, 2, 3)) AS arrays_last_win

query
SELECT map_from_entries(array(struct('p', 1), struct('p', 2))) AS entries_last_win

query
SELECT str_to_map('k:1,k:2', ',', ':') AS strmap_last_win
