-- transform_values: rewrite values with a (key, value) lambda
-- (reference expressions/map/*, re-authored).

statement
CREATE OR REPLACE TEMP VIEW tv AS SELECT map('a', 1, 'b', 2) AS m
UNION ALL SELECT map('z', -5)
UNION ALL SELECT map()

query
SELECT transform_values(m, (k, v) -> v * 100) FROM tv

query
SELECT transform_values(m, (k, v) -> concat(k, '=', CAST(v AS STRING))) FROM tv

query
SELECT transform_values(m, (k, v) -> CASE WHEN v < 0 THEN NULL ELSE v END) FROM tv

query
SELECT transform_values(map('x', array(1, 2), 'y', array(3)), (k, v) -> size(v))

query
SELECT transform_values(CAST(NULL AS MAP<STRING,INT>), (k, v) -> v)

-- composition: filter then rewrite, key case-folded
query
SELECT transform_values(map_filter(map('A', 1, 'b', 2, 'C', 3), (k, v) -> v % 2 = 1),
  (k, v) -> v + length(lower(k)))
