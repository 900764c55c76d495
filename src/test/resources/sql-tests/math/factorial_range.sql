-- factorial: exact longs for 0..20, NULL beyond 20 and for negatives
-- (no overflow error — the function is defined as a 21-entry table).

query
SELECT factorial(0), factorial(1), factorial(5), factorial(10)

query
SELECT factorial(20), factorial(19) * 20 = factorial(20)

query
SELECT factorial(21), factorial(100), factorial(-1), factorial(NULL)

query
SELECT x, factorial(x) FROM VALUES (0), (7), (13), (20), (21) AS t(x)
