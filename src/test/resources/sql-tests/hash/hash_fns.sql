-- Hash functions are pure and deterministic: identical under all
-- physical configs. Literal + column inputs, binary and string.

statement
CREATE OR REPLACE TEMP VIEW hsh AS SELECT * FROM VALUES
  ('spark'), (''), ('The quick brown fox'), (NULL) AS t(s)

query
SELECT s, md5(s), sha1(s), crc32(s) FROM hsh

query
SELECT s, sha2(s, 256), sha2(s, 512) FROM hsh

query
SELECT s, hash(s), xxhash64(s) FROM hsh

query
SELECT hash(1, 'a', 2.0D, true), xxhash64(CAST('bytes' AS BINARY)), md5(CAST('bytes' AS BINARY))
