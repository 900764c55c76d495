-- array_sort with custom comparator lambda; sort_array null placement.

statement
CREATE OR REPLACE TEMP VIEW sc AS SELECT array(3, NULL, 1, 2) AS a, array('bb', 'a', 'ccc') AS s

query
SELECT sort_array(a), sort_array(a, false) FROM sc

query
SELECT array_sort(a) FROM sc

query
SELECT array_sort(s, (x, y) -> CASE WHEN length(x) < length(y) THEN -1 WHEN length(x) > length(y) THEN 1 ELSE 0 END) FROM sc

query
SELECT array_sort(array(3, 1, 2), (x, y) -> y - x)
