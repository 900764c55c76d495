-- substring/locate boundary positions: negative, zero, beyond-length.

statement
CREATE OR REPLACE TEMP VIEW se AS SELECT 'abcdef' AS s

query
SELECT substring(s, 0), substring(s, 1), substring(s, -2), substring(s, 99) FROM se

query
SELECT substring(s, 2, 0), substring(s, 2, 99), substring(s, -4, 2) FROM se

query
SELECT locate('cd', s), locate('cd', s, 4), locate('', s), locate('zz', s) FROM se

query
SELECT left(s, 0), left(s, -1), right(s, 99), repeat(s, 0) FROM se

query
SELECT overlay(s PLACING 'XY' FROM 3), overlay(s PLACING 'XY' FROM 3 FOR 0), overlay(s PLACING '' FROM 2 FOR 3) FROM se
