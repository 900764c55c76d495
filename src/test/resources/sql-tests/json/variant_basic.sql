-- Spark 4 VariantType: parse/extract/typed-get edges (q134's surface).
SELECT variant_get(parse_json('{"a": 1, "b": "two", "c": [1,2,3]}'), '$.a', 'int') AS a_int;
SELECT variant_get(parse_json('{"a": 1, "b": "two"}'), '$.b', 'string') AS b_str;
SELECT variant_get(parse_json('{"c": [10, 20, 30]}'), '$.c[1]', 'int') AS c_elem;
SELECT variant_get(parse_json('{"a": {"b": 42}}'), '$.a.b', 'bigint') AS nested;
SELECT variant_get(parse_json('{"a": 1}'), '$.missing', 'string') AS missing_is_null;
SELECT try_parse_json('definitely not json') AS malformed_is_null;
SELECT is_variant_null(parse_json('null')) AS json_null_true,
       is_variant_null(parse_json('1')) AS json_one_false;
SELECT schema_of_variant(parse_json('{"a": 1, "b": "x"}')) AS sov;
SELECT cast(variant_get(parse_json('{"d": 2.5}'), '$.d') AS DOUBLE) AS untyped_then_cast;
SELECT to_json(parse_json('{"z": 1, "a": 2}')) AS roundtrip;
