-- map_filter: keep entries whose (key, value) predicate holds
-- (reference expressions/map/*, re-authored).

statement
CREATE OR REPLACE TEMP VIEW mf AS SELECT
  map('a', 1, 'bb', 2, 'ccc', 3) AS m
UNION ALL SELECT map('z', 0)
UNION ALL SELECT map()

query
SELECT map_filter(m, (k, v) -> v > 1) FROM mf

query
SELECT map_filter(m, (k, v) -> length(k) = 2) FROM mf

query
SELECT map_filter(m, (k, v) -> false) AS emptied, size(map_filter(m, (k, v) -> true)) AS kept FROM mf

-- predicate mixing key and value; NULL values survive only via IS NULL
query
SELECT map_filter(map('a', 1, 'b', CAST(NULL AS INT)), (k, v) -> v IS NULL)

query
SELECT map_filter(CAST(NULL AS MAP<STRING,INT>), (k, v) -> true)
