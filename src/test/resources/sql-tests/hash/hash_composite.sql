-- hash/xxhash64 over composite types are deterministic functions of
-- the value — identical under all physical configs. Maps are hashed
-- through map_entries (Spark prohibits hash on raw MAP values).

statement
CREATE OR REPLACE TEMP VIEW hc AS SELECT * FROM VALUES
  (array(1, 2), named_struct('a', 1, 'b', 'x'), map('k', 1)),
  (CAST(array() AS ARRAY<INT>), named_struct('a', 0, 'b', ''), CAST(map() AS MAP<STRING, INT>)) AS t(arr, st, m)

query
SELECT hash(arr), hash(st), hash(map_entries(m)) FROM hc

query
SELECT xxhash64(arr), xxhash64(st), xxhash64(map_entries(m)) FROM hc

query
SELECT hash(arr, st, map_entries(m)), hash(NULL), xxhash64(NULL) FROM hc

query
SELECT md5(CAST(hash(arr) AS STRING)), crc32(CAST(xxhash64(st) AS STRING)) FROM hc
