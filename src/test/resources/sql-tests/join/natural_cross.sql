-- NATURAL and CROSS joins.

statement
CREATE OR REPLACE TEMP VIEW n1 AS SELECT * FROM VALUES (1, 'a'), (2, 'b') AS t(k, v1)

statement
CREATE OR REPLACE TEMP VIEW n2 AS SELECT * FROM VALUES (1, 'x'), (3, 'y') AS t(k, v2)

query
SELECT * FROM n1 NATURAL JOIN n2

query
SELECT * FROM n1 NATURAL LEFT JOIN n2

query
SELECT count(*) FROM n1 CROSS JOIN n2

query
SELECT n1.k, n2.k FROM n1 CROSS JOIN n2 WHERE n1.k < n2.k
