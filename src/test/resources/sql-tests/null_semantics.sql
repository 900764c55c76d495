-- NULL propagation and three-valued logic over boundary rows
SELECT x, y, x + y AS s, x > y AS gt, x = y AS eq, x <=> y AS nseq
FROM VALUES (1.0, CAST(NULL AS DOUBLE)), (CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)), (2.0, 3.0) AS t(x, y)
ORDER BY x NULLS FIRST, y NULLS FIRST;
SELECT coalesce(a, b, 'z') AS c, nullif(a, 'x') AS n
FROM VALUES ('x', 'y'), (CAST(NULL AS STRING), 'y'), (CAST(NULL AS STRING), CAST(NULL AS STRING)) AS t(a, b)
ORDER BY c, n NULLS FIRST;
SELECT count(*) AS n_all, count(x) AS n_x, sum(x) AS s, avg(x) AS a
FROM VALUES (1), (CAST(NULL AS INT)), (3) AS t(x);
