-- extract/date_part field coverage incl. DOW/DOY/week-of-year boundaries.

statement
CREATE OR REPLACE TEMP VIEW t_ex AS SELECT * FROM VALUES
  (TIMESTAMP '2024-01-01 00:00:00'), (TIMESTAMP '2024-12-31 23:59:59.999999'),
  (TIMESTAMP '2020-02-29 12:30:45') AS t(ts)

query
SELECT ts, extract(YEAR FROM ts), extract(QUARTER FROM ts), extract(MONTH FROM ts),
       extract(DAY FROM ts), extract(HOUR FROM ts), extract(MINUTE FROM ts), extract(SECOND FROM ts) FROM t_ex

query
SELECT ts, extract(DOW FROM ts), extract(DAYOFWEEK FROM ts), extract(DOY FROM ts), extract(WEEK FROM ts) FROM t_ex

query
SELECT date_part('YEAROFWEEK', DATE '2024-01-01'), date_part('DOW', DATE '2017-01-01'),
       dayofweek(DATE '2017-01-01'), weekday(DATE '2017-01-01'), weekofyear(DATE '2024-01-01')

query
SELECT extract(SECOND FROM TIMESTAMP '2024-01-01 00:00:00.123456'), date_part('SECOND', TIMESTAMP '2024-01-01 00:00:01.5')
