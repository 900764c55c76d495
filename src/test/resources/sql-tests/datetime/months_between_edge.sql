-- months_between end-of-month conventions and fractional results.

query
SELECT months_between(DATE'2020-03-31', DATE'2020-02-29'), months_between(DATE'2020-02-29', DATE'2020-01-31')

query
SELECT months_between(DATE'2020-03-15', DATE'2020-02-15'), round(months_between(DATE'2020-03-14', DATE'2020-02-15'), 8)

query
SELECT months_between(TIMESTAMP'2020-01-31 12:00:00', TIMESTAMP'2020-01-01 00:00:00', true),
       months_between(TIMESTAMP'2020-01-31 12:00:00', TIMESTAMP'2020-01-01 00:00:00', false)

query
SELECT add_months(DATE'2020-01-31', 1), add_months(DATE'2020-02-29', 12), add_months(DATE'2020-03-31', -1)
