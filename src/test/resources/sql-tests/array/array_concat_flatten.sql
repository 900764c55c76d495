-- concat over arrays, flatten of nested arrays, null element propagation.

statement
CREATE OR REPLACE TEMP VIEW t_cc AS SELECT * FROM VALUES
  (array(1, 2), array(3)), (array(5), CAST(array() AS ARRAY<INT>)),
  (CAST(NULL AS ARRAY<INT>), array(9)) AS t(a, b)

query
SELECT concat(a, b), concat(b, a), concat(a, a, b) FROM t_cc

query
SELECT flatten(array(array(1, 2), array(3))), flatten(array(array(1), CAST(array() AS ARRAY<INT>))),
       flatten(CAST(NULL AS ARRAY<ARRAY<INT>>)), flatten(array(array(1), CAST(NULL AS ARRAY<INT>)))

query
SELECT flatten(array(a, b)) FROM t_cc
