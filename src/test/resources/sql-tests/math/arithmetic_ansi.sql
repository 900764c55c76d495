-- ANSI arithmetic: overflow throws; try_* variants return NULL.

statement
CREATE OR REPLACE TEMP VIEW arith AS SELECT * FROM VALUES
  (2147483647, 9223372036854775807L), (1, 1L) AS t(i, l)

query
SELECT try_add(i, 1), try_subtract(-2147483648, 1), try_multiply(l, 2) FROM arith

query
SELECT i + 0, l - 0, i * 1, l % 2, pmod(i, 97) FROM arith

query expect_error(overflow)
SELECT i + 1 FROM arith WHERE i = 2147483647

query expect_error(overflow)
SELECT l * 2 FROM arith WHERE l > 1

query expect_error(overflow)
SELECT abs(CAST(-2147483648 AS INT) - 0)
