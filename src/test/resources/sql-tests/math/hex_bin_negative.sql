-- hex/bin of numbers including negatives (two's complement rendering).

query
SELECT hex(255), hex(0), hex(-1L), hex('abc')

query
SELECT bin(10), bin(0), bin(-2L)

query
SELECT conv('-10', 10, 16), conv('ffffffffffffffff', 16, -10)

query
SELECT hex(unhex('4D')), CAST(unhex('4D7953514C') AS STRING)
