-- make_date/make_timestamp/make_interval valid and try_* invalid forms.

query
SELECT make_date(2024, 2, 29), make_date(1, 1, 1), make_date(9999, 12, 31)

query
SELECT make_timestamp(2024, 8, 9, 13, 45, 56.123456), make_timestamp(2024, 1, 1, 0, 0, 60.0)

query
SELECT try_make_timestamp(2023, 2, 29, 0, 0, 0), try_make_timestamp(2024, 13, 1, 0, 0, 0), try_make_timestamp(2024, 1, 1, 25, 0, 0)

query
SELECT make_interval(1, 2, 0, 3, 4, 5, 6.5), make_dt_interval(1, 2, 3, 4.000005), make_ym_interval(2, 11)

query expect_error(invalid_date_ansi)
SELECT make_date(2023, 2, 29)

query expect_error(second_out_of_range)
SELECT make_timestamp(2024, 1, 1, 0, 0, 61.0)
