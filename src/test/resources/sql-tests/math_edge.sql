-- Float boundary values through math functions
SELECT x, abs(x) AS ax, sign(x) AS sg, isnan(x) AS nn
FROM VALUES (0.0), (-0.0), (CAST('NaN' AS DOUBLE)), (CAST('Infinity' AS DOUBLE)), (-1.5) AS t(x)
ORDER BY x NULLS FIRST;
SELECT round(x, 0) AS r0, round(x, 1) AS r1, floor(x) AS fl, ceil(x) AS ce
FROM VALUES (2.5), (-2.5), (3.45), (-3.45), (0.05) AS t(x)
ORDER BY r0, r1;
SELECT greatest(a, b, c) AS g, least(a, b, c) AS l
FROM VALUES (1, 2, 3), (-2147483648, 2147483647, 0) AS t(a, b, c)
ORDER BY g;
