-- months_between fractional results and roundOff flag.

query
SELECT months_between(DATE '2024-03-31', DATE '2024-02-29'), months_between(DATE '2024-02-29', DATE '2024-03-31')

query
SELECT months_between(TIMESTAMP '2024-03-15 12:00:00', TIMESTAMP '2024-02-15 00:00:00'),
       months_between(TIMESTAMP '2024-03-15 12:00:00', TIMESTAMP '2024-02-15 00:00:00', false)

query
SELECT months_between(DATE '2024-01-31', DATE '2024-02-29'), months_between(DATE '2024-05-01', DATE '2024-05-01'),
       months_between(NULL, DATE '2024-01-01')
