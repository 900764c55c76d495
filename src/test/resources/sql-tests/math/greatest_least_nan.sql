-- greatest/least skip NULLs; NaN is greatest among doubles.

query
SELECT greatest(1, 2, 3), least(1, 2, 3), greatest(1, NULL, 3), least(NULL, NULL, 2)

query
SELECT greatest(1.0D, CAST('NaN' AS DOUBLE)), least(CAST('NaN' AS DOUBLE), 1.0D),
       greatest(CAST('Infinity' AS DOUBLE), CAST('NaN' AS DOUBLE))

query
SELECT greatest(NULL, NULL), least('b', 'a', 'c'), greatest(DATE '2024-01-01', DATE '2023-12-31')

query
SELECT greatest(-0.0D, 0.0D), least(-0.0D, 0.0D)
