-- encode/decode charset round-trips, to_binary/try_to_binary across
-- hex/base64/utf-8 formats; invalid hex errors where the try_ variant
-- yields NULL.

query
SELECT decode(encode('graft', 'utf-8'), 'utf-8'),
       decode(encode('graft', 'utf-16'), 'utf-16'),
       decode(encode('graft', 'us-ascii'), 'us-ascii')

query
SELECT hex(encode('abc', 'utf-8')), hex(encode('', 'utf-8')),
       hex(encode(NULL, 'utf-8'))

query
SELECT hex(to_binary('6162', 'hex')), hex(to_binary('YWJj', 'base64')),
       hex(to_binary('abc', 'utf-8')), hex(to_binary('616263'))

query
SELECT hex(try_to_binary('zz', 'hex')), hex(try_to_binary('a?c', 'base64')),
       hex(try_to_binary(NULL, 'hex'))

query expect_error(invalid_hex_digit)
SELECT to_binary('zz', 'hex')

query
SELECT hex(to_binary('cafe', 'hex')), decode(unhex('4D7953514C'), 'utf-8'),
       base64(to_binary('YWJj', 'base64'))
