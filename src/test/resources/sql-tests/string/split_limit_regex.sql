-- split: the pattern is a Java regex; limit>0 caps the part count (the
-- last part keeps the remainder), limit<=0 splits fully; interior empty
-- parts survive. split_part takes a LITERAL delimiter, 1-based, negative
-- counts from the end.

query
SELECT split('a,b,c', ','), split('a,b,c', ',', 2), split('a,b,c', ',', 1)

query
SELECT split('a1b22c333d', '[0-9]+'), split('a.b.c', '\\.'),
       split('axbXc', '(?i)x')

query
SELECT split('a,,b,,', ','), split('a,,b,,', ',', -1), split(',,a', ',')

query
SELECT split('', ','), split('abc', ''), split('abc', 'z')

query
SELECT split(NULL, ','), split('a,b', NULL),
       split_part('x|y|z', '|', 2), split_part('x|y|z', '|', -3)
