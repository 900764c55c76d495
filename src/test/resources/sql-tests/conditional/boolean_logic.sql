-- Three-valued logic truth tables for AND / OR / NOT.

statement
CREATE OR REPLACE TEMP VIEW bools AS SELECT * FROM VALUES
  (true), (false), (CAST(NULL AS BOOLEAN)) AS t(b)

query
SELECT x.b, y.b, x.b AND y.b, x.b OR y.b FROM bools x CROSS JOIN bools y

query
SELECT b, NOT b, b IS TRUE, b IS NOT TRUE, b IS FALSE, b IS UNKNOWN FROM bools
