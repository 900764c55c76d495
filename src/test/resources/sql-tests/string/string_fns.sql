-- Core string surface (reference expressions/string/*, re-authored).

statement
CREATE OR REPLACE TEMP VIEW strs AS SELECT * FROM VALUES
  ('Hello World'), ('  padded  '), (''), ('MixedCase'), (NULL) AS t(s)

query
SELECT s, upper(s), lower(s), initcap(s), reverse(s), length(s) FROM strs

query
SELECT s, ltrim(s), rtrim(s), trim(s), trim(BOTH 'd' FROM s) FROM strs

query
SELECT s, lpad(s, 15, '*'), rpad(s, 15, '*'), repeat(s, 2) FROM strs

query
SELECT s, substring(s, 2, 3), left(s, 4), right(s, 4), locate('o', s) FROM strs

query
SELECT s, contains(s, 'World'), startswith(s, 'He'), endswith(s, 'ld') FROM strs

query
SELECT concat_ws('-', 'a', NULL, 'b'), concat('x', NULL, 'y'), ascii('A'), chr(66)

query
SELECT translate('ananas', 'an', 'xy'), overlay('Spark SQL' PLACING '_' FROM 6), substring_index('a.b.c', '.', 2)

query
SELECT format_string('%d-%s', 7, 'x'), format_number(1234567.891, 2), soundex('Robert'), levenshtein('kitten', 'sitting')
