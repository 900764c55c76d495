-- base64/unbase64 and encode/decode charset round trips.

query
SELECT base64(CAST('Spark' AS BINARY)), base64(CAST('' AS BINARY)), base64(CAST(NULL AS BINARY))

query
SELECT CAST(unbase64(base64(CAST('round trip' AS BINARY))) AS STRING)

query
SELECT decode(encode('abc', 'utf-8'), 'utf-8'), decode(encode('café', 'utf-8'), 'utf-8')

query
SELECT hex(encode('AB', 'utf-8')), CAST(unbase64('U3Bhcms=') AS STRING), encode(NULL, 'utf-8')
