-- Pure non-equi join (no equi key): plans BroadcastNestedLoopJoin —
-- acceptable ONLY when one side is tiny (the band table here).

statement
CREATE OR REPLACE TEMP VIEW vals AS SELECT * FROM VALUES
  (1, 5.0D), (2, 45.0D), (3, 95.0D), (4, 150.0D) AS t(id, v)

statement
CREATE OR REPLACE TEMP VIEW bands AS SELECT * FROM VALUES
  ('low', 0.0D, 50.0D), ('mid', 50.0D, 100.0D), ('high', 100.0D, 1000.0D) AS t(band, lo, hi)

query
SELECT id, v, band FROM vals JOIN bands ON v >= lo AND v < hi

query
SELECT id, v, band FROM vals LEFT JOIN bands ON v >= lo AND v < hi

query
SELECT band, count(*) AS n FROM vals JOIN bands ON v >= lo AND v < hi GROUP BY band
