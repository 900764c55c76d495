-- unix_date/unix_seconds/millis/micros and the inverse date_from_unix_date/timestamp_seconds.

query
SELECT unix_date(DATE '1970-01-01'), unix_date(DATE '1970-01-02'), unix_date(DATE '1969-12-31')

query
SELECT date_from_unix_date(0), date_from_unix_date(365), date_from_unix_date(-1), date_from_unix_date(NULL)

query
SELECT unix_seconds(TIMESTAMP '1970-01-01 00:00:01'), unix_millis(TIMESTAMP '1970-01-01 00:00:00.5'),
       unix_micros(TIMESTAMP '1969-12-31 23:59:59.999999')

query
SELECT timestamp_seconds(1), timestamp_seconds(1.5D), timestamp_millis(1500),
       timestamp_micros(1500000), timestamp_seconds(-1)

query
SELECT unix_seconds(timestamp_seconds(1723200000)), timestamp_micros(unix_micros(TIMESTAMP '2024-08-09 10:00:00.000001'))
