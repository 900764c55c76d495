-- map_concat edge semantics: empty/NULL operands, duplicate keys under
-- the default EXCEPTION dedup policy, type widening
-- (reference expressions/map/*, re-authored).

query
SELECT map_concat(map('a', 1), map('b', 2), map('c', 3))

query
SELECT map_concat(map('a', 1), map()) AS right_empty,
       map_concat(map(), map('b', 2)) AS left_empty,
       size(map_concat(map(), map())) AS both_empty

query
SELECT map_concat(map('a', 1), CAST(NULL AS MAP<STRING,INT>)) AS null_operand

-- duplicate key across operands errors by default
query expect_error(duplicate_map_key)
SELECT map_concat(map('k', 1), map('k', 2))

-- value types widen to the common type
query
SELECT map_concat(map('a', CAST(1 AS INT)), map('b', CAST(2 AS BIGINT)))

statement
CREATE OR REPLACE TEMP VIEW mc AS SELECT map('p', 1) AS m1, map('q', 2) AS m2
UNION ALL SELECT map('r', 3), map()

query
SELECT map_concat(m1, m2), map_keys(map_concat(m1, m2)) FROM mc
