-- Bitwise surface: and/or/xor/not, shifts, bit_count, getbit.

statement
CREATE OR REPLACE TEMP VIEW bits AS SELECT * FROM VALUES
  (61680L, 3855L), (-1L, 1L), (0L, 0L), (255L, 8L) AS t(a, b)

query
SELECT a, b, a & b, a | b, a ^ b, ~a FROM bits

query
SELECT shiftleft(a, 2), shiftright(a, 2), shiftrightunsigned(CAST(a AS INT), 2) FROM bits

query
SELECT a, bit_count(a), getbit(a, 0), getbit(a, 3) FROM bits
