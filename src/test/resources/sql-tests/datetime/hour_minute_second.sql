-- hour/minute/second on timestamps, strings, and fractional seconds.

statement
CREATE OR REPLACE TEMP VIEW t_hms AS SELECT * FROM VALUES
  (TIMESTAMP '2024-08-09 00:00:00'), (TIMESTAMP '2024-08-09 23:59:59.999999'),
  (TIMESTAMP '2024-08-09 12:30:45.5'), (NULL) AS t(ts)

query
SELECT ts, hour(ts), minute(ts), second(ts) FROM t_hms

query
SELECT hour(TIMESTAMP '2024-01-01 07:08:09'), minute(TIMESTAMP '2024-01-01 07:08:09'),
       second(TIMESTAMP '2024-01-01 07:08:09')

query
SELECT hour(DATE '2024-01-01'), minute(DATE '2024-01-01'), second(DATE '2024-01-01')
