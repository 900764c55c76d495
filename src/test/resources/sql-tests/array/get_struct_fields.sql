-- Field extraction from arrays of structs (per-element projection).

statement
CREATE OR REPLACE TEMP VIEW t_st AS SELECT * FROM VALUES
  (array(named_struct('x', 1, 'y', 'a'), named_struct('x', 2, 'y', 'b'))),
  (array(named_struct('x', 3, 'y', CAST(NULL AS STRING)))),
  (CAST(array() AS ARRAY<STRUCT<x: INT, y: STRING>>)),
  (CAST(NULL AS ARRAY<STRUCT<x: INT, y: STRING>>)) AS t(a)

query
SELECT a.x, a.y FROM t_st

query
SELECT get(a, 0).x, try_element_at(a, 1).y FROM t_st

query
SELECT transform(a, s -> s.x + 10) FROM t_st
