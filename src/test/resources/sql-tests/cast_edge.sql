-- Cast boundaries under try_cast (ANSI-safe)
SELECT try_cast('2147483647' AS INT) AS maxi, try_cast('2147483648' AS INT) AS ovi,
       try_cast('1e3' AS DOUBLE) AS sci, try_cast('' AS INT) AS emp,
       try_cast('  42 ' AS INT) AS pad, try_cast('true' AS BOOLEAN) AS b1,
       try_cast('yes' AS BOOLEAN) AS b2;
SELECT CAST(1.99 AS INT) AS trunc_pos, CAST(-1.99 AS INT) AS trunc_neg,
       CAST(true AS INT) AS b2i, CAST(127 AS TINYINT) AS ti,
       try_cast(128 AS TINYINT) AS ovf_ti;
