-- Aggregates over empty / all-null / single-row groups
SELECT g, count(*) AS n, sum(x) AS s, min(x) AS mn, max(x) AS mx, avg(x) AS av
FROM VALUES (1, 10), (1, CAST(NULL AS INT)), (2, CAST(NULL AS INT)), (3, 7) AS t(g, x)
GROUP BY g ORDER BY g;
SELECT count(*) AS n, sum(x) AS s FROM VALUES (1) AS t(x) WHERE x > 99;
SELECT g, collect_list(x) AS lst
FROM (SELECT 1 AS g, 5 AS x) GROUP BY g ORDER BY g;
