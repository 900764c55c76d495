-- array_prepend/append/insert incl. negative indices.

query
SELECT array_prepend(array(2, 3), 1), array_append(array(1, 2), 3)

query
SELECT array_insert(array('a', 'c'), 2, 'b'), array_insert(array('a', 'b'), -1, 'z')

query
SELECT array_insert(array(1), 4, 9), array_insert(array(1, 2, 3), 1, 0)

query
SELECT array_position(array(10, 20, 10), 10), array_remove(array(1, 2, 1), 1)
