-- add_months clamps to month end; negative months; leap-day behavior.

query
SELECT add_months(DATE '2024-01-31', 1), add_months(DATE '2024-01-29', 1), add_months(DATE '2024-02-29', 12)

query
SELECT add_months(DATE '2024-03-31', -1), add_months(DATE '2024-01-31', -2), add_months(NULL, 1),
       add_months(DATE '2024-05-15', NULL)

query
SELECT add_months(DATE '2024-08-31', 6), add_months(DATE '2023-11-30', 3)

query
SELECT add_months(TIMESTAMP '2024-01-31 12:00:00', 1)
