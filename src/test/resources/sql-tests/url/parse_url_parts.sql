-- parse_url over every part selector (HOST/PATH/QUERY/REF/PROTOCOL/
-- AUTHORITY/FILE/USERINFO), keyed QUERY extraction, and malformed
-- inputs via try_parse_url / expect_error — under the ANSI default,
-- parse_url throws on an invalid URL (reference expressions/url/*,
-- re-authored).

statement
CREATE OR REPLACE TEMP VIEW pu AS SELECT * FROM VALUES
  ('https://user:pw@spark.apache.org:8080/docs/latest?k=v&x=1#frag'),
  ('http://example.com'),
  ('ftp://files.example.com/pub/file.txt'),
  (NULL) AS t(u)

query
SELECT u, parse_url(u, 'PROTOCOL'), parse_url(u, 'HOST'), parse_url(u, 'PATH') FROM pu

query
SELECT u, parse_url(u, 'AUTHORITY'), parse_url(u, 'USERINFO'), parse_url(u, 'FILE'), parse_url(u, 'REF') FROM pu

query
SELECT parse_url('https://h/p?a=1&b=2&a=3', 'QUERY'),
       parse_url('https://h/p?a=1&b=2&a=3', 'QUERY', 'a'),
       parse_url('https://h/p?a=1&b=2', 'QUERY', 'missing')

query
SELECT try_parse_url('not a url', 'HOST') AS bad_host,
       try_parse_url('https://ok.example.com/x', 'HOST') AS good_host

query expect_error(invalid_url)
SELECT parse_url('not a url', 'HOST')

-- no-query URL: QUERY selector yields NULL, keyed lookup too
query
SELECT parse_url('https://h/path', 'QUERY'), parse_url('https://h/path', 'QUERY', 'k')
