-- LEFT ANTI / LEFT SEMI joins and the NOT IN null trap.

statement
CREATE OR REPLACE TEMP VIEW jl AS SELECT * FROM VALUES
  (1, 'l1'), (2, 'l2'), (3, 'l3'), (NULL, 'lnull') AS t(k, lv)

statement
CREATE OR REPLACE TEMP VIEW jr AS SELECT * FROM VALUES
  (1, 'r1'), (NULL, 'rnull') AS t(k, rv)

query
SELECT k, lv FROM jl LEFT SEMI JOIN jr USING (k)

query
SELECT k, lv FROM jl LEFT ANTI JOIN jr USING (k)

query
SELECT k, lv FROM jl WHERE k IN (SELECT k FROM jr)

query
SELECT k, lv FROM jl WHERE k NOT IN (SELECT k FROM jr)

query
SELECT k, lv FROM jl WHERE NOT EXISTS (SELECT 1 FROM jr WHERE jr.k = jl.k)
