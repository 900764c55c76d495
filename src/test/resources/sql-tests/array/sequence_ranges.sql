-- sequence() over ints, dates, and timestamps with interval steps.

query
SELECT sequence(1, 5), sequence(5, 1), sequence(0, 10, 5), sequence(10, 0, -5)

query
SELECT sequence(DATE'2020-01-01', DATE'2020-01-04'), size(sequence(DATE'2020-01-01', DATE'2020-12-01', INTERVAL '1' MONTH))

query
SELECT sequence(TIMESTAMP'2020-01-01 00:00:00', TIMESTAMP'2020-01-01 03:00:00', INTERVAL '1' HOUR)

query expect_error(illegal_sequence)
SELECT sequence(1, 10, -1)
