-- arrays_zip pads shorter arrays with nulls and yields structs.

query
SELECT arrays_zip(array(1, 2), array('a', 'b')), arrays_zip(array(1, 2, 3), array('a'))

query
SELECT arrays_zip(array(1), CAST(array() AS ARRAY<STRING>)),
       arrays_zip(CAST(NULL AS ARRAY<INT>), array('a'))

statement
CREATE OR REPLACE TEMP VIEW t_zip AS SELECT * FROM VALUES
  (array(1, 2), array('x', 'y')), (array(3), array('p', 'q', 'r')) AS t(nums, strs)

query
SELECT arrays_zip(nums, strs) FROM t_zip

query
SELECT z.nums, z.strs FROM (SELECT explode(arrays_zip(nums, strs)) AS z FROM t_zip)

query
SELECT arrays_zip(array(1, 2), array('a', 'b'), array(true, false))
