-- Temporal surface: add/sub/diff, boundaries, formatting, extraction,
-- unix conversions, make_date/make_timestamp.

statement
CREATE OR REPLACE TEMP VIEW dts AS SELECT * FROM VALUES
  (DATE'2020-02-29', TIMESTAMP'2020-02-29 23:30:00'),
  (DATE'1999-12-31', TIMESTAMP'1999-12-31 23:59:59'),
  (NULL, NULL) AS t(d, ts)

query
SELECT d, date_add(d, 1), date_sub(d, 1), add_months(d, 12), last_day(d), next_day(d, 'MO') FROM dts

query
SELECT datediff(DATE'2020-03-01', d), months_between(DATE'2021-02-28', d) FROM dts

query
SELECT d, trunc(d, 'MM'), trunc(d, 'YEAR'), date_trunc('HOUR', ts) FROM dts

query
SELECT d, year(d), quarter(d), month(d), day(d), dayofweek(d), weekofyear(d), dayofyear(d) FROM dts

query
SELECT ts, hour(ts), minute(ts), second(ts), unix_timestamp(ts), from_unixtime(0) FROM dts

query
SELECT date_format(ts, 'yyyy-MM-dd HH:mm'), date_format(d, 'E MMM d, yyyy') FROM dts

query
SELECT make_date(2024, 2, 29), make_timestamp(2024, 2, 29, 12, 30, 45.5), to_date('2015/06/07', 'yyyy/MM/dd')
