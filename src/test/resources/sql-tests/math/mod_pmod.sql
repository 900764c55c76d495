-- % / mod / pmod sign conventions; pmod is always non-negative.

query
SELECT 7 % 3, -7 % 3, 7 % -3, -7 % -3

query
SELECT mod(7, 3), mod(-7, 3), pmod(7, 3), pmod(-7, 3), pmod(7, -3)

query
SELECT mod(7.5D, 2.0D), pmod(-7.5D, 2.0D), mod(CAST(7 AS TINYINT), CAST(3 AS TINYINT))

query
SELECT try_mod(7, 0), pmod(0, 3), mod(NULL, 3), pmod(3, NULL)

query expect_error(mod_zero_ansi)
SELECT 7 % 0
