-- trunc (date, unit-string) and date_trunc (unit, timestamp) across units.

statement
CREATE OR REPLACE TEMP VIEW t_tr AS SELECT * FROM VALUES
  (TIMESTAMP '2024-08-09 13:45:56.123456') AS t(ts)

query
SELECT trunc(DATE '2024-08-09', 'YEAR'), trunc(DATE '2024-08-09', 'QUARTER'),
       trunc(DATE '2024-08-09', 'MONTH'), trunc(DATE '2024-08-09', 'WEEK')

query
SELECT date_trunc('YEAR', ts), date_trunc('MONTH', ts), date_trunc('DAY', ts),
       date_trunc('HOUR', ts), date_trunc('MINUTE', ts), date_trunc('SECOND', ts) FROM t_tr

query
SELECT date_trunc('WEEK', ts), date_trunc('QUARTER', ts), date_trunc('MILLISECOND', ts) FROM t_tr

query
SELECT trunc(DATE '2024-08-09', 'bogus'), trunc(NULL, 'MONTH'), date_trunc('DAY', NULL)
