-- Second string batch: split_part, find_in_set, elt, sentences-free
-- surface, encode/decode, base64, conv.

query
SELECT split_part('a,b,c', ',', 2), split_part('a,b,c', ',', -1), find_in_set('b', 'a,b,c')

query
SELECT elt(2, 'x', 'y', 'z'), position('ob' IN 'noob'), instr('noob', 'ob')

query
SELECT base64('spark'), CAST(unbase64(base64('spark')) AS STRING), hex('abc'), CAST(unhex(hex('abc')) AS STRING)

query
SELECT hex(encode('text', 'UTF-8')), decode(encode('text', 'UTF-8'), 'UTF-8')

query
SELECT conv('255', 10, 16), conv('ff', 16, 10), conv('1010', 2, 10)

query
SELECT char_length('héllo'), octet_length('héllo'), bit_length('héllo')

query
SELECT btrim('xxhixx', 'x'), mask('AbCd-123'), mask('AbCd-123', 'X', 'x', '#', '*')
