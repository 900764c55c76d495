-- Misc expression surface: typeof, assert-like, named args, uuid-free
-- deterministic misc functions.

query
SELECT typeof(1), typeof(1L), typeof('s'), typeof(1.5D), typeof(DATE'2020-01-01'), typeof(array(1))

query
SELECT greatest(1, 2, 3), least(1.5D, 0.5D), positive(-5), negative(5)

query
SELECT isnull(NULL), isnotnull(1), nvl(NULL, 'd'), stack(1, 'a', 'b')

query
SELECT bit_count(255), bin(10), hypot(3, 4), factorial(5)

query
SELECT e(), pi(), degrees(pi()), radians(180.0D), sign(-2.5D)
