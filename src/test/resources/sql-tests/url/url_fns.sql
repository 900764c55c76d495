-- url_encode/url_decode/try_url_decode + parse_url
-- (reference expressions/url/*, re-authored).

statement
CREATE OR REPLACE TEMP VIEW urls AS SELECT * FROM VALUES
  ('https://spark.apache.org'), ('hello world'), ('a+b=c&d=e'),
  (''), (NULL), ('~*()'), ('a%20b') AS t(s)

query
SELECT s, url_encode(s) FROM urls

query
SELECT s, url_decode(url_encode(s)) = s AS roundtrip FROM urls

query
SELECT url_decode('a%20b'), url_decode('a+b'), try_url_decode('%zz') AS bad_null

query
SELECT parse_url('https://spark.apache.org/docs?k=v#frag', 'HOST'),
       parse_url('https://spark.apache.org/docs?k=v#frag', 'PATH'),
       parse_url('https://spark.apache.org/docs?k=v#frag', 'QUERY', 'k')

query expect_error(illegal_url)
SELECT url_decode('%zz')
