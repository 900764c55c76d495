-- LEGACY (ANSI-off) cast semantics: malformed -> NULL, overflow wraps.
-- Config: spark.sql.ansi.enabled=false

statement
CREATE OR REPLACE TEMP VIEW cast_leg AS SELECT * FROM VALUES
  ('123'), ('abc'), (''), ('12.7'), (NULL) AS t(s)

query
SELECT s, CAST(s AS INT) AS i, CAST(s AS DOUBLE) AS d FROM cast_leg

query
SELECT CAST(9223372036854775807L AS INT) AS wrap_l2i, CAST(4294967296L AS INT) AS wrap_4g

query
SELECT CAST(257 AS TINYINT) AS wrap_ti, CAST(-1.99D AS INT) AS trunc_neg, CAST(CAST('NaN' AS DOUBLE) AS INT) AS nan2i

query
SELECT CAST('2020-13-45' AS DATE) AS bad_date, CAST('nope' AS TIMESTAMP) AS bad_ts
