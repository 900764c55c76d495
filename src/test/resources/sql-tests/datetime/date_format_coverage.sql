-- date_format pattern letters: era, quarter, day-of-year, am/pm, week-based fields.

statement
CREATE OR REPLACE TEMP VIEW t_fmt AS SELECT * FROM VALUES
  (TIMESTAMP '2024-08-09 13:05:07.123'), (TIMESTAMP '2024-01-01 00:00:00') AS t(ts)

query
SELECT date_format(ts, 'yyyy-MM-dd'), date_format(ts, 'yyyy/DDD'), date_format(ts, 'QQQ yyyy'),
       date_format(ts, 'hh:mm a'), date_format(ts, 'HH:mm:ss.SSS') FROM t_fmt

query
SELECT date_format(ts, 'EEEE'), date_format(ts, 'E'), date_format(ts, 'MMM MMMM'), date_format(ts, 'G yyyy') FROM t_fmt

query
SELECT date_format(DATE '2024-08-09', 'dd MMM yyyy'), date_format(NULL, 'yyyy')
