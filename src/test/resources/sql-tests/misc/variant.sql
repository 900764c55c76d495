-- VARIANT type: parse_json / try_parse_json / variant_get
-- (reference misc/variant.sql scope, re-authored).

query
SELECT to_json(parse_json('{"a": 1, "b": [1, 2]}'))

query
SELECT variant_get(parse_json('{"a": 1, "b": {"c": "x"}}'), '$.a', 'int'),
       variant_get(parse_json('{"a": 1, "b": {"c": "x"}}'), '$.b.c', 'string'),
       variant_get(parse_json('[10, 20, 30]'), '$[1]', 'int')

query
SELECT to_json(try_parse_json('not valid')) IS NULL, to_json(try_parse_json('{"ok": true}'))

query
SELECT is_variant_null(parse_json('null')), is_variant_null(parse_json('{"a": null}'))

query expect_error(malformed_json)
SELECT parse_json('{bad')
