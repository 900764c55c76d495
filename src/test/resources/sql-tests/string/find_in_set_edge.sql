-- find_in_set: 1-based position in comma list, 0 if absent or needle has comma.

query
SELECT find_in_set('b', 'a,b,c'), find_in_set('d', 'a,b,c'), find_in_set('', 'a,,c')

query
SELECT find_in_set('a,b', 'a,b,c'), find_in_set(NULL, 'a,b'), find_in_set('a', NULL)

query
SELECT find_in_set('c', 'a,b,c'), find_in_set(' b', 'a, b,c')
