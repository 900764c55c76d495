-- bit_length/octet_length/length on ASCII, multibyte, binary, empty.

statement
CREATE OR REPLACE TEMP VIEW t_len AS SELECT * FROM VALUES
  ('abc'), (''), ('café'), ('日本語'), (NULL) AS t(s)

query
SELECT s, length(s), bit_length(s), octet_length(s), char_length(s), character_length(s) FROM t_len

query
SELECT bit_length(CAST('ab' AS BINARY)), octet_length(CAST('ab' AS BINARY)), length(CAST('abc' AS BINARY))

query
SELECT length(' pad '), length(NULL)
