-- ANSI temporal errors: invalid make_date/parse patterns throw;
-- try-style alternatives return NULL.

query
SELECT try_to_timestamp('2020-99-01', 'yyyy-MM-dd') AS bad_parse, to_date('2015-06-07') AS ok

query
SELECT make_dt_interval(1, 2, 3, 4.5), make_ym_interval(1, 6)

query
SELECT DATE'2020-01-31' + INTERVAL '1' MONTH, TIMESTAMP'2020-01-01 00:00:00' + INTERVAL '90' MINUTE

query
SELECT datediff(MONTH, DATE'2020-01-01', DATE'2020-07-04'), datediff(YEAR, DATE'2019-01-01', DATE'2021-06-01')

query expect_error(invalid_date)
SELECT make_date(2020, 13, 1)

query expect_error(parse_error)
SELECT to_timestamp('2020-99-01', 'yyyy-MM-dd')
