-- split with limit, split_part 1-based and negative, substring_index.

query
SELECT split('a,b,c', ','), split('a,b,c', ',', 2), split('abc', ''), split('', ',')

query
SELECT split_part('a:b:c', ':', 1), split_part('a:b:c', ':', -1), split_part('a:b:c', ':', 5),
       split_part('a::c', ':', 2)

query
SELECT substring_index('www.apache.org', '.', 1), substring_index('www.apache.org', '.', 2),
       substring_index('www.apache.org', '.', -1), substring_index('www.apache.org', '.', 0)

query
SELECT split('a1b2c3', '[0-9]'), split_part(NULL, ':', 1), substring_index('abc', '', 1)

query expect_error(split_part_zero)
SELECT split_part('a:b', ':', 0)
