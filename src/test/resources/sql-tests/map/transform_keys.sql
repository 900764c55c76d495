-- transform_keys: rewrite keys with a lambda; duplicate results obey
-- spark.sql.mapKeyDedupPolicy (reference expressions/map/*, re-authored).

statement
CREATE OR REPLACE TEMP VIEW tk AS SELECT map('a', 1, 'B', 2) AS m
UNION ALL SELECT map('c', 3)
UNION ALL SELECT map()

query
SELECT transform_keys(m, (k, v) -> upper(k)) FROM tk

query
SELECT transform_keys(m, (k, v) -> concat(k, '_', CAST(v AS STRING))) FROM tk

query
SELECT transform_keys(map(1, 'x', 2, 'y'), (k, v) -> k * 10)

-- collapsing keys errors under the default EXCEPTION dedup policy
query expect_error(duplicate_map_key)
SELECT transform_keys(map('a', 1, 'b', 2), (k, v) -> 'same')

query
SELECT transform_keys(CAST(NULL AS MAP<STRING,INT>), (k, v) -> k)
