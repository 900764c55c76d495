-- JSON surface: path extraction, tuple, from_json/to_json, array/object helpers.

statement
CREATE OR REPLACE TEMP VIEW js AS SELECT * FROM VALUES
  ('{"a": 1, "b": {"c": "x"}, "arr": [1,2,3]}'),
  ('{"a": null}'),
  ('not json'),
  (NULL) AS t(j)

query
SELECT j, get_json_object(j, '$.a'), get_json_object(j, '$.b.c'), get_json_object(j, '$.arr[1]') FROM js

query
SELECT json_tuple(j, 'a', 'b') FROM js

query
SELECT j, from_json(j, 'a INT').a FROM js

query
SELECT to_json(named_struct('k', 1, 'v', 'two')), to_json(map('m', 5)), to_json(array(1, 2))

query
SELECT json_array_length('[1,2,3]'), json_object_keys('{"x":1,"y":2}'), schema_of_json('{"n": 1, "s": "a"}')
