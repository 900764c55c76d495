-- substring_index: count>0 keeps the left of the count-th delimiter,
-- count<0 the right, count=0 empty; whole string when the delimiter is
-- absent; multi-char delimiters match literally (not as regex).

query
SELECT substring_index('a.b.c', '.', 1), substring_index('a.b.c', '.', 2),
       substring_index('a.b.c', '.', -1), substring_index('a.b.c', '.', -2)

query
SELECT substring_index('a.b.c', '.', 0), substring_index('a.b.c', '.', 9),
       substring_index('a.b.c', '.', -9)

query
SELECT substring_index('abc', '.', 1), substring_index('', '.', 1),
       substring_index('a.b.c', '', 1)

query
SELECT substring_index('a::b::c', '::', 2), substring_index('a.b.c', '.b.', 1)

query
SELECT substring_index(NULL, '.', 1), substring_index('a.b', NULL, 1),
       substring_index('a.b', '.', NULL)
