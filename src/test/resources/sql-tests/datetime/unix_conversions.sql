-- Epoch conversions at second/milli/micro precision, unix_date family.

statement
CREATE OR REPLACE TEMP VIEW ep AS SELECT * FROM VALUES
  (0L), (86400L), (-86400L), (1700000000L) AS t(sec)

query
SELECT sec, timestamp_seconds(sec), timestamp_millis(sec * 1000), timestamp_micros(sec * 1000000) FROM ep

query
SELECT sec, unix_seconds(timestamp_seconds(sec)), unix_millis(timestamp_seconds(sec)), unix_micros(timestamp_seconds(sec)) FROM ep

query
SELECT unix_date(DATE'1970-01-02'), unix_date(DATE'1969-12-31'), date_from_unix_date(1), date_from_unix_date(-1)

query
SELECT to_unix_timestamp('2020-01-01', 'yyyy-MM-dd'), from_unixtime(86400, 'yyyy-MM-dd HH:mm')
