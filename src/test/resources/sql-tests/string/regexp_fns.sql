-- Regex surface: extract/extract_all/replace/count/instr/substr, split.

statement
CREATE OR REPLACE TEMP VIEW rex AS SELECT * FROM VALUES
  ('a1b22c333'), ('no digits here'), (''), (NULL) AS t(s)

query
SELECT s, regexp_extract(s, '([0-9]+)', 1), regexp_extract_all(s, '[0-9]+', 0) FROM rex

query
SELECT s, regexp_replace(s, '[0-9]+', '#'), regexp_count(s, '[0-9]+') FROM rex

query
SELECT s, s RLIKE '[0-9]', regexp_instr(s, '[0-9]+'), regexp_substr(s, '[0-9]+') FROM rex

query
SELECT split('a,b,,c', ','), split('a1b2c3', '[0-9]'), split('abc', '')
