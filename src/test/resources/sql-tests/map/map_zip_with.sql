-- map_zip_with: merge two maps by key with a lambda. Keys absent on one
-- side see NULL for that side's value (reference expressions/map/*,
-- re-authored).

statement
CREATE OR REPLACE TEMP VIEW mzw AS SELECT
  map('a', 1, 'b', 2) AS m1, map('b', 20, 'c', 30) AS m2
UNION ALL SELECT map('x', 5), map()
UNION ALL SELECT map(), map()

query
SELECT map_zip_with(m1, m2, (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0)) FROM mzw

query
SELECT map_zip_with(m1, m2, (k, v1, v2) -> struct(v1, v2)) FROM mzw

query
SELECT map_zip_with(map(1, 'a', 2, 'b'), map(2, 'x'), (k, v1, v2) -> concat_ws('/', v1, v2))

query
SELECT map_zip_with(m1, m2, (k, v1, v2) -> CASE WHEN v1 IS NULL THEN 'right-only'
  WHEN v2 IS NULL THEN 'left-only' ELSE 'both' END) FROM mzw

-- NULL map input -> NULL result
query
SELECT map_zip_with(CAST(NULL AS MAP<STRING,INT>), map('a', 1), (k, v1, v2) -> v2)
