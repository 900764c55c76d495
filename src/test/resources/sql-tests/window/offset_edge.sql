-- lag/lead at partition edges, offset 0, negative-offset equivalence.

statement
CREATE OR REPLACE TEMP VIEW oe AS SELECT * FROM VALUES
  ('a', 1), ('a', 2), ('b', 1) AS t(g, seq)

query
SELECT g, seq, lag(seq, 0) OVER w, lead(seq, 0) OVER w FROM oe WINDOW w AS (PARTITION BY g ORDER BY seq)

query
SELECT g, seq, lag(seq, 5) OVER w, lead(seq, 5, -99) OVER w FROM oe WINDOW w AS (PARTITION BY g ORDER BY seq)

query
SELECT g, seq, lag(seq, -1) OVER w = lead(seq, 1) OVER w FROM oe WINDOW w AS (PARTITION BY g ORDER BY seq)

query
SELECT g, seq, first_value(seq) OVER w, last_value(seq) OVER w FROM oe WINDOW w AS (PARTITION BY g ORDER BY seq)
