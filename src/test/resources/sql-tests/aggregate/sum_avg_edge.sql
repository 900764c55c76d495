-- sum/avg edges: empty groups, all-NULL groups, integer vs double avg.

statement
CREATE OR REPLACE TEMP VIEW sae AS SELECT * FROM VALUES
  ('a', 1), ('a', 2), ('b', NULL), ('c', 2147483647) AS t(g, v)

query
SELECT g, sum(v), avg(v), min(v), max(v) FROM sae GROUP BY g

query
SELECT sum(v) FROM sae WHERE v > 99999

query
SELECT count(*) FROM sae WHERE v > 99999

query
SELECT g, sum(CAST(v AS BIGINT)), avg(CAST(v AS DOUBLE)) FROM sae GROUP BY g

query
SELECT sum(DISTINCT v), count(DISTINCT g) FROM sae
