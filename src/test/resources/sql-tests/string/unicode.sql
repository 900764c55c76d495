-- Non-ASCII handling: lengths, casing, substring, reverse, encode.

statement
CREATE OR REPLACE TEMP VIEW uni AS SELECT * FROM VALUES
  ('héllo'), ('日本語'), ('naïve café'), ('emoji: 😀 ok') AS t(s)

query
SELECT s, length(s), octet_length(s), char_length(s) FROM uni

query
SELECT s, upper(s), lower(s), initcap(s) FROM uni

query
SELECT s, substring(s, 1, 3), reverse(s), left(s, 2) FROM uni

query
SELECT s, ascii(s), hex(encode(s, 'UTF-8')) FROM uni WHERE length(s) <= 5
