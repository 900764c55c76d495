-- Arrays of arrays: nested transform, flatten, deep element access.

statement
CREATE OR REPLACE TEMP VIEW md AS SELECT array(array(1, 2), array(3), CAST(array() AS ARRAY<INT>)) AS aa

query
SELECT aa, size(aa), aa[0], aa[0][1] FROM md

query
SELECT flatten(aa), size(flatten(aa)) FROM md

query
SELECT transform(aa, x -> size(x)), transform(aa, x -> transform(x, y -> y * 10)) FROM md

query
SELECT aggregate(aa, 0, (acc, x) -> acc + size(x)), filter(aa, x -> size(x) > 0) FROM md
