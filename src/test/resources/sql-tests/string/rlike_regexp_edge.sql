-- rlike/regexp_like anchors, classes; regexp_extract groups; regexp_count/instr.

query
SELECT 'abc123' rlike '[a-z]+[0-9]+', 'abc' rlike '^abc$', 'abc' rlike 'B', rlike('xyz', 'x.z')

query
SELECT regexp_extract('a1b2c3', '([a-z])([0-9])', 1), regexp_extract('a1b2c3', '([a-z])([0-9])', 2),
       regexp_extract('abc', '([0-9])', 1), regexp_extract_all('a1b2', '([a-z])([0-9])', 2)

query
SELECT regexp_count('ababab', 'ab'), regexp_count('abc', 'z'), regexp_instr('aXbXc', 'X')

query
SELECT regexp_substr('phone 867-5309', '[0-9]{3}-[0-9]{4}'), regexp_like(NULL, 'a'), 'a' rlike NULL

query expect_error(bad_pattern)
SELECT 'abc' rlike '['
