-- Structs compare field-by-field in declaration order; usable as sort/group keys.

statement
CREATE OR REPLACE TEMP VIEW t_sc AS SELECT * FROM VALUES
  (named_struct('a', 1, 'b', 'x')), (named_struct('a', 1, 'b', 'w')),
  (named_struct('a', 0, 'b', 'z')), (named_struct('a', 1, 'b', CAST(NULL AS STRING))) AS t(s)

query
SELECT s FROM t_sc ORDER BY s

query
SELECT s, count(*) FROM t_sc GROUP BY s ORDER BY s

query
SELECT named_struct('a', 1, 'b', 'x') = named_struct('a', 1, 'b', 'x'),
       named_struct('a', 1) < named_struct('a', 2),
       struct(1, 'x') = struct(1, 'x')

query
SELECT min(s), max(s) FROM t_sc
