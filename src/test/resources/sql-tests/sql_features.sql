-- Spark 4 SQL surface: LATERAL subqueries, listagg, SQL scripting.
query
SELECT t.id, l.m FROM VALUES (1), (2), (3) AS t(id),
LATERAL (SELECT t.id * 10 AS m) l ORDER BY t.id

query
SELECT t.id, c.v FROM VALUES (1), (2) AS t(id),
LATERAL (SELECT v FROM VALUES ('a'), ('b') AS u(v) WHERE t.id = 1 OR v = 'b') c
ORDER BY t.id, c.v

query
SELECT g, listagg(x, '|') WITHIN GROUP (ORDER BY x) AS ordered_concat
FROM VALUES (1, 'b'), (1, 'a'), (2, 'z') AS t(g, x) GROUP BY g ORDER BY g

query
SELECT listagg(DISTINCT x, ',') WITHIN GROUP (ORDER BY x) AS dedup_concat
FROM VALUES ('b'), ('a'), ('a'), ('b') AS t(x)

query
BEGIN
  DECLARE v INT DEFAULT 3;
  SET v = v * 7;
  SELECT v + 1 AS computed;
END
