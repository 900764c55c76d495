-- bin / conv base conversions, negative two's complement rendering.

query
SELECT bin(13), bin(0), bin(1), bin(-1), bin(CAST(NULL AS BIGINT))

query
SELECT conv('100', 2, 10), conv('ff', 16, 10), conv('255', 10, 16), conv('777', 8, 10)

query
SELECT conv('-10', 10, 16), conv('z', 36, 10), conv('10', 10, 37), conv(NULL, 10, 2)

query
SELECT conv('kona', 27, 10), bin(9223372036854775807)
