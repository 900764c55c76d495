-- width_bucket + scalar subqueries in projection and predicate.

statement
CREATE OR REPLACE TEMP VIEW wb AS SELECT * FROM VALUES
  (0.5D), (3.0D), (5.0D), (9.99D), (10.0D), (-1.0D), (11.0D) AS t(v)

query
SELECT v, width_bucket(v, 0, 10, 5) FROM wb

query
SELECT v, width_bucket(v, 10, 0, 5) AS reversed FROM wb

query
SELECT v, v - (SELECT round(avg(v), 6) FROM wb) AS delta FROM wb

query
SELECT count(*) FROM wb WHERE v > (SELECT round(avg(v), 6) FROM wb)
