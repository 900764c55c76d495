-- LATERAL VIEW explode and lateral subqueries.

statement
CREATE OR REPLACE TEMP VIEW lv AS SELECT * FROM VALUES
  (1, array('a', 'b')), (2, array('c')), (3, CAST(array() AS ARRAY<STRING>)) AS t(id, tags)

query
SELECT id, tag FROM lv LATERAL VIEW explode(tags) AS tag

query
SELECT id, tag FROM lv LATERAL VIEW OUTER explode(tags) AS tag

query
SELECT id, pos, tag FROM lv LATERAL VIEW posexplode(tags) AS pos, tag

query
SELECT id, up FROM lv, LATERAL (SELECT upper(id || '!') AS up)
