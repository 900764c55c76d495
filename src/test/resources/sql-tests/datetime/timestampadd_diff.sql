-- timestampadd/timestampdiff units + date +/- integer arithmetic.

statement
CREATE OR REPLACE TEMP VIEW tsd AS SELECT TIMESTAMP'2020-02-28 23:00:00' AS ts, DATE'2020-02-28' AS d

query
SELECT timestampadd(HOUR, 2, ts), timestampadd(DAY, 2, ts), timestampadd(MONTH, 1, ts), timestampadd(YEAR, -1, ts) FROM tsd

query
SELECT timestampdiff(HOUR, ts, TIMESTAMP'2020-03-01 01:00:00'), timestampdiff(DAY, ts, TIMESTAMP'2020-03-01 01:00:00'), timestampdiff(MONTH, TIMESTAMP'2019-12-28 00:00:00', ts) FROM tsd

query
SELECT d + 1, d - 1, d + INTERVAL '2' DAY, DATE'2020-03-01' - d FROM tsd

query
SELECT date_part('year', ts), date_part('doy', ts), extract(WEEK FROM ts), extract(QUARTER FROM d) FROM tsd
