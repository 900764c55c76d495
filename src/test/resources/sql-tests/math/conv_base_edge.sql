-- conv: radix conversion 2..36, case-insensitive digits, negative inputs
-- interpreted as unsigned 64-bit in the target base, null passthrough.

query
SELECT conv('ff', 16, 10), conv('FF', 16, 10), conv('255', 10, 16),
       conv('255', 10, 2)

query
SELECT conv('z', 36, 10), conv('zz', 36, 16), conv('10', 36, 10)

query
SELECT conv('-1', 10, 16), conv('-10', 16, 10)

query
SELECT conv('11abc', 10, 16), conv('', 10, 16), conv(NULL, 10, 16)

query
SELECT conv('1010', 2, 10), conv(conv('12345', 10, 7), 7, 10)
