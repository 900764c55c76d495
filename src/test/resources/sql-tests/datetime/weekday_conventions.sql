-- Day-of-week conventions: dayofweek (1=Sunday), weekday (0=Monday),
-- dayname/monthname.

statement
CREATE OR REPLACE TEMP VIEW wd AS SELECT * FROM VALUES
  (DATE'2023-07-09'), (DATE'2023-07-10'), (DATE'2023-07-15') AS t(d)

query
SELECT d, dayofweek(d), weekday(d) FROM wd

query
SELECT d, dayname(d), monthname(d) FROM wd

query
SELECT d, extract(DOW FROM d), extract(YEAROFWEEK FROM d), weekofyear(d) FROM wd
