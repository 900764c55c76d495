-- Struct surface: create, field access, comparison, JSON roundtrip.

statement
CREATE OR REPLACE TEMP VIEW st AS SELECT * FROM VALUES
  (1, 'one'), (2, 'two') AS t(n, s)

query
SELECT struct(n, s), named_struct('num', n, 'name', s) FROM st

query
SELECT struct(n, s).n, named_struct('num', n, 'name', s).name FROM st

query
SELECT struct(n, s) = struct(n, s), struct(1, 'one') < struct(2, 'aaa') FROM st

query
SELECT to_json(named_struct('num', n, 'name', s)) FROM st

query
SELECT from_json('{"num": 5, "name": "five"}', 'num INT, name STRING').num
