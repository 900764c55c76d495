-- UTF-8 validation functions (Spark 4).

query
SELECT is_valid_utf8('hello'), is_valid_utf8('héllo')

query
SELECT is_valid_utf8(CAST(unhex('FF') AS STRING))

query
SELECT make_valid_utf8('ok'), length(make_valid_utf8(CAST(unhex('41FF42') AS STRING)))

query
SELECT try_validate_utf8('fine'), try_validate_utf8(CAST(unhex('C0') AS STRING)) IS NULL
