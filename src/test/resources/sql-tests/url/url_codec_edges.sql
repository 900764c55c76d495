-- url_encode/url_decode/try_url_decode edges: reserved characters,
-- UTF-8 multibyte, '+'-as-space, truncated/invalid percent escapes
-- (reference expressions/url/*, re-authored).

query
SELECT url_encode('a b'), url_encode('a+b'), url_encode('a/b?c=d&e'), url_encode('100%')

query
SELECT url_encode('héllo wörld'), url_decode(url_encode('héllo wörld')) AS utf8_roundtrip

query
SELECT url_decode('a+b') AS plus_is_space, url_decode('a%2Bb') AS literal_plus,
       url_decode('%41%42%43') AS abc

query
SELECT try_url_decode('%') AS truncated1, try_url_decode('%2') AS truncated2,
       try_url_decode('%gg') AS bad_hex, try_url_decode('ok%20fine') AS good

query
SELECT url_encode(''), url_decode(''), url_encode(NULL), url_decode(NULL)

query expect_error(illegal_url_decode)
SELECT url_decode('%2')

statement
CREATE OR REPLACE TEMP VIEW codec AS SELECT * FROM VALUES
  ('k=v&k2=v 2'), ('emoji: éè'), ('trailing%')
  AS t(s)

query
SELECT s, try_url_decode(url_encode(s)) = s AS roundtrip FROM codec
