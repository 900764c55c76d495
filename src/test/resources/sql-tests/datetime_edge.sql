-- Leap years, month-end clamping, epoch boundaries
SELECT d, last_day(d) AS eom, date_add(d, 1) AS nxt, year(d) AS y, dayofyear(d) AS doy
FROM VALUES (DATE '2024-02-28'), (DATE '2024-02-29'), (DATE '2023-02-28'), (DATE '1970-01-01'), (DATE '2000-12-31') AS t(d)
ORDER BY d;
SELECT months_between(DATE '2024-03-31', DATE '2024-02-29') AS mb,
       add_months(DATE '2024-01-31', 1) AS am,
       datediff(DATE '2024-03-01', DATE '2024-02-28') AS dd;
