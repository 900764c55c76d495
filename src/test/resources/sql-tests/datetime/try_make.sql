-- try_make_* constructors: NULL on invalid parts.

query
SELECT make_date(2024, 2, 29), try_to_date('2023-02-29', 'yyyy-MM-dd'), try_to_date('2020-13-01', 'yyyy-MM-dd')

query
SELECT try_make_timestamp(2020, 6, 15, 12, 30, 45.5), try_make_timestamp(2020, 6, 15, 25, 0, 0)

query
SELECT make_interval(1, 2, 0, 3, 4, 5, 6.5), make_dt_interval(0, 1, 2, 3.5)

query
SELECT try_make_interval(0, 0, 2147483647, 2147483647, 0, 0, 0) IS NULL, try_make_interval(0, 0, 0, 1, 2, 3, 4.5)
