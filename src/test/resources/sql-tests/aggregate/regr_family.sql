-- Linear-regression aggregate family.

statement
CREATE OR REPLACE TEMP VIEW reg AS SELECT * FROM VALUES
  (1.0D, 2.1D), (2.0D, 3.9D), (3.0D, 6.1D), (4.0D, 8.0D), (NULL, 1.0D), (5.0D, NULL) AS t(x, y)

query
SELECT regr_count(y, x), round(regr_avgx(y, x), 6), round(regr_avgy(y, x), 6) FROM reg

query
SELECT round(regr_slope(y, x), 6), round(regr_intercept(y, x), 6), round(regr_r2(y, x), 6) FROM reg

query
SELECT round(regr_sxx(y, x), 6), round(regr_syy(y, x), 6), round(regr_sxy(y, x), 6) FROM reg
