-- array_sort: nulls last ascending; sort_array: nulls first ascending, last descending.

query
SELECT array_sort(array(3, NULL, 1)), sort_array(array(3, NULL, 1)),
       sort_array(array(3, NULL, 1), false)

query
SELECT array_sort(array('pear', 'apple', NULL)), sort_array(array('pear', 'apple', NULL), true)

query
SELECT array_sort(array(CAST('NaN' AS DOUBLE), 1.0D, CAST('-Infinity' AS DOUBLE), NULL))

query
SELECT array_sort(CAST(array() AS ARRAY<INT>)), array_sort(CAST(NULL AS ARRAY<INT>))
