-- session_window() in batch aggregation: gap-based grouping.

statement
CREATE OR REPLACE TEMP VIEW swb AS SELECT * FROM VALUES
  (1, TIMESTAMP'2020-01-01 00:00:00', 1.0D),
  (1, TIMESTAMP'2020-01-01 00:03:00', 2.0D),
  (1, TIMESTAMP'2020-01-01 01:00:00', 4.0D),
  (2, TIMESTAMP'2020-01-01 00:00:00', 8.0D) AS t(uid, ts, v)

query
SELECT uid, session_window.start, session_window.end, count(*) AS n, sum(v) AS total
FROM swb GROUP BY uid, session_window(ts, '5 minutes')

query
SELECT uid, count(*) AS n_sessions FROM (
  SELECT uid, session_window(ts, '5 minutes') AS w FROM swb GROUP BY uid, session_window(ts, '5 minutes'))
GROUP BY uid

query
SELECT uid, window.start, count(*) FROM swb GROUP BY uid, window(ts, '30 minutes')
