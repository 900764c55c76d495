-- try_add/try_subtract/try_multiply/try_divide: NULL instead of ANSI error.

query
SELECT try_add(2147483647, 1), try_add(1, 1), try_subtract(-2147483648, 1),
       try_multiply(9223372036854775807, 2)

query
SELECT try_divide(10, 0), try_divide(10.0D, 0.0D), try_divide(0, 0), try_divide(10, 2)

query
SELECT try_add(CAST(126 AS TINYINT), CAST(1 AS TINYINT)), try_add(CAST(127 AS TINYINT), CAST(1 AS TINYINT))

query
SELECT try_add(NULL, 1), try_divide(NULL, 0), try_multiply(1e308, 10.0D)

query expect_error(int_overflow_ansi)
SELECT 2147483647 + 1
