-- String->numeric/boolean casts under ANSI (default on in Spark 4):
-- malformed input throws; TRY_CAST is the NULL-tolerant path.

statement
CREATE OR REPLACE TEMP VIEW cast_str AS SELECT * FROM VALUES
  ('123'), ('  42 '), ('-7'), ('1e3'), (''), ('abc'), (NULL) AS t(s)

query
SELECT s, TRY_CAST(s AS INT) AS i, TRY_CAST(s AS DOUBLE) AS d, TRY_CAST(s AS BOOLEAN) AS b FROM cast_str

query
SELECT CAST(s AS INT) FROM cast_str WHERE s = '123'

query
SELECT CAST('  42 ' AS INT), CAST('true' AS BOOLEAN), CAST('FALSE' AS BOOLEAN), TRY_CAST('yes' AS BOOLEAN)

query expect_error(cast_invalid)
SELECT CAST(s AS INT) FROM cast_str WHERE s = 'abc'

query expect_error(cast_invalid)
SELECT CAST('' AS INT)
