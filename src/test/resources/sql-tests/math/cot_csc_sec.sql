-- cot and reciprocal identities; division-free checks at exact points.

query
SELECT cot(1.0D), cot(-1.0D), cot(CAST('NaN' AS DOUBLE)), cot(NULL)

query
SELECT cot(0.0D), 1.0D / tan(1.0D) - cot(1.0D) < 1e-12

statement
CREATE OR REPLACE TEMP VIEW t_cot AS SELECT * FROM VALUES (0.5D), (1.5D), (-0.5D) AS t(x)

query
SELECT x, abs(cot(x) * tan(x) - 1.0D) < 1e-12 FROM t_cot
