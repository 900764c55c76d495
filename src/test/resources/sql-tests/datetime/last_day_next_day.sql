-- last_day across leap/non-leap Februaries; next_day weekday names.

query
SELECT last_day(DATE '2024-02-10'), last_day(DATE '2023-02-10'), last_day(DATE '2024-12-01'),
       last_day(NULL)

query
SELECT next_day(DATE '2015-01-14', 'TU'), next_day(DATE '2015-01-14', 'WEDNESDAY'),
       next_day(DATE '2015-01-14', 'wed')

query
SELECT next_day(DATE '2024-08-09', 'FRI'), next_day(NULL, 'MON')

query expect_error(bad_dayofweek_ansi)
SELECT next_day(DATE '2015-01-14', 'NOTADAY')
