-- div (integral division): truncation toward zero, bigint result type,
-- ANSI overflow at Long.MIN_VALUE div -1, divide-by-zero error vs
-- try_divide null.

query
SELECT 7 div 2, -7 div 2, 7 div -2, -7 div -2

query
SELECT 9223372036854775807L div -1, CAST(1 AS TINYINT) div CAST(2 AS TINYINT)

query expect_error(long_min_div_minus_one_overflow)
SELECT (-9223372036854775807L - 1L) div -1

query expect_error(div_by_zero)
SELECT 1 div 0

query
SELECT try_divide(1, 0), try_divide(10, 3), 10.5BD div 3
