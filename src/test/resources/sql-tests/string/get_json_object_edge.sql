-- get_json_object paths: nested, arrays, missing keys, malformed JSON.

statement
CREATE OR REPLACE TEMP VIEW t_json AS SELECT * FROM VALUES
  ('{"a": 1, "b": {"c": "x"}}'), ('{"arr": [1, 2, 3]}'), ('{"a": null}'),
  ('not json'), (NULL) AS t(j)

query
SELECT j, get_json_object(j, '$.a'), get_json_object(j, '$.b.c'), get_json_object(j, '$.missing') FROM t_json

query
SELECT get_json_object('{"arr": [1, 2, 3]}', '$.arr[0]'), get_json_object('{"arr": [1, 2, 3]}', '$.arr[*]'),
       get_json_object('{"arr": []}', '$.arr[0]')

query
SELECT json_tuple('{"a": 1, "b": "two"}', 'a', 'b'), get_json_object('{"k.d": 5}', "$['k.d']")
