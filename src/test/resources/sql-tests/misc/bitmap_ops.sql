-- Bitmap aggregate surface (distinct counting over dense int keys).

statement
CREATE OR REPLACE TEMP VIEW bm AS SELECT * FROM VALUES (1L), (2L), (2L), (70000L), (1L) AS t(v)

query
SELECT bitmap_bucket_number(v), bitmap_bit_position(v) FROM bm

query
SELECT bitmap_count(bitmap_construct_agg(bitmap_bit_position(v))) FROM bm WHERE bitmap_bucket_number(v) = 1

query
SELECT sum(cnt) FROM (
  SELECT bitmap_count(bitmap_construct_agg(bitmap_bit_position(v))) AS cnt
  FROM bm GROUP BY bitmap_bucket_number(v))
