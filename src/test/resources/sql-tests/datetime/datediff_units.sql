-- datediff both arg orders; timestampdiff-style datediff(unit, start, end).

query
SELECT datediff(DATE '2024-03-01', DATE '2024-02-01'), datediff(DATE '2024-02-01', DATE '2024-03-01'),
       datediff(DATE '2024-01-01', DATE '2024-01-01')

query
SELECT datediff(YEAR, DATE '2020-06-01', DATE '2024-01-01'),
       datediff(MONTH, TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-03-14 23:59:59'),
       datediff(DAY, DATE '2024-01-01', DATE '2024-03-01')

query
SELECT date_diff(DATE '2024-03-01', DATE '2024-02-28'), datediff(NULL, DATE '2024-01-01')

query
SELECT datediff(HOUR, TIMESTAMP '2024-01-01 10:00:00', TIMESTAMP '2024-01-02 09:59:59'),
       datediff(MINUTE, TIMESTAMP '2024-01-01 10:00:00', TIMESTAMP '2024-01-01 10:30:30')
