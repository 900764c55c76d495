-- UNPIVOT (melt) and its PIVOT inverse in SQL form (q86/q135 twins).
SELECT * FROM VALUES (1, 10.0D, 20.0D), (2, 30.0D, CAST(NULL AS DOUBLE)) AS t(id, a, b)
UNPIVOT (val FOR attr IN (a, b)) ORDER BY id, attr;
-- UNPIVOT INCLUDE NULLS keeps the null cell
SELECT * FROM VALUES (1, 10.0D, CAST(NULL AS DOUBLE)) AS t(id, a, b)
UNPIVOT INCLUDE NULLS (val FOR attr IN (a, b)) ORDER BY id, attr;
-- multi-value-column unpivot
SELECT * FROM VALUES (1, 10L, 'x', 20L, 'y') AS t(id, a1, a2, b1, b2)
UNPIVOT ((v_num, v_str) FOR grp IN ((a1, a2) AS ga, (b1, b2) AS gb)) ORDER BY id, grp;
-- PIVOT back: long form to wide
SELECT * FROM (SELECT id, attr, val FROM VALUES
    (1, 'a', 10.0D), (1, 'b', 20.0D), (2, 'a', 30.0D) AS t(id, attr, val))
PIVOT (sum(val) FOR attr IN ('a' AS a, 'b' AS b)) ORDER BY id;
