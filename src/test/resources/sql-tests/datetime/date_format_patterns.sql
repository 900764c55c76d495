-- date_format pattern letters (era/quarter/week/day-of-week/am-pm).

statement
CREATE OR REPLACE TEMP VIEW dfp AS SELECT TIMESTAMP'2023-07-09 15:04:05.123' AS ts

query
SELECT date_format(ts, 'yyyy'), date_format(ts, 'yy'), date_format(ts, 'MM'), date_format(ts, 'MMM'), date_format(ts, 'MMMM') FROM dfp

query
SELECT date_format(ts, 'dd'), date_format(ts, 'D'), date_format(ts, 'E'), date_format(ts, 'EEEE'), date_format(ts, 'F') FROM dfp

query
SELECT date_format(ts, 'HH:mm:ss'), date_format(ts, 'hh:mm a'), date_format(ts, 'SSS'), date_format(ts, 'QQ') FROM dfp

query
SELECT date_format(ts, 'G'), date_format(ts, 'yyyy-MM-dd''T''HH:mm:ss') FROM dfp

query expect_error(bad_pattern)
SELECT date_format(ts, 'bad-b') FROM dfp
