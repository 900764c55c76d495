-- struct.* expansion in projections.

statement
CREATE OR REPLACE TEMP VIEW sx AS SELECT named_struct('a', 1, 'b', 'x') AS st, 10 AS extra
UNION ALL SELECT named_struct('a', 2, 'b', 'y'), 20

query
SELECT st.* FROM sx

query
SELECT st.*, extra FROM sx

query
SELECT sub.st.a, sub.st.b FROM (SELECT st FROM sx) sub

query
SELECT count(*), sum(st.a) FROM sx
