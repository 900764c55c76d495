-- size/cardinality of arrays and maps; NULL input yields NULL under ANSI defaults.

query
SELECT size(array(1, 2, 3)), size(CAST(array() AS ARRAY<INT>)), cardinality(array(1)),
       size(map(1, 'a', 2, 'b')), size(CAST(NULL AS ARRAY<INT>))

query
SELECT cardinality(map('k', 'v')), cardinality(CAST(NULL AS MAP<INT, STRING>)),
       size(array(NULL, NULL))
