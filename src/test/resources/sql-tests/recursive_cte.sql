-- Spark 4 recursive CTEs (UNION ALL form only —
-- UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE; q136's operator).
WITH RECURSIVE s(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM s WHERE n < 10)
SELECT count(*) AS n_rows, sum(n) AS total FROM s;
-- accumulating two columns
WITH RECURSIVE fib(a, b) AS (
  SELECT 0L, 1L UNION ALL SELECT b, a + b FROM fib WHERE b <= 100)
SELECT a FROM fib ORDER BY a;
-- recursion joining a static relation (bounded BFS over VALUES edges)
WITH RECURSIVE
  e AS (SELECT * FROM VALUES (1, 2), (2, 3), (3, 4), (2, 5) AS t(src, dst)),
  walk(node, hop) AS (
    SELECT 1, 0 UNION ALL
    SELECT e.dst, w.hop + 1 FROM walk w JOIN e ON e.src = w.node WHERE w.hop < 3)
SELECT node, min(hop) AS hops FROM walk GROUP BY node ORDER BY node;
