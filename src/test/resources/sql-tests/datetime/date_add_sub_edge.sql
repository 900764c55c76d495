-- date_add/date_sub/dateadd across month ends, leap days, negative deltas.

statement
CREATE OR REPLACE TEMP VIEW t_da AS SELECT * FROM VALUES
  (DATE '2024-02-28', 1), (DATE '2023-02-28', 1), (DATE '2024-01-31', 30),
  (DATE '2024-03-01', -1), (NULL, 5), (DATE '2024-06-15', NULL) AS t(d, n)

query
SELECT d, n, date_add(d, n), date_sub(d, n) FROM t_da

query
SELECT date_add(DATE '1969-12-31', 1), date_sub(DATE '1970-01-01', 1),
       dateadd(DAY, 7, DATE '2024-01-01')

query
SELECT date_add(DATE '9999-12-30', 1), date_sub(DATE '0001-01-02', 1)
