-- Correlation/covariance/variance family, rounded for merge-order
-- independence (the suite runs at 4 shuffle partitions).

statement
CREATE OR REPLACE TEMP VIEW ccv AS SELECT * FROM VALUES
  ('g1', 1.0D, 2.0D), ('g1', 2.0D, 4.0D), ('g1', 3.0D, 6.1D),
  ('g2', 1.0D, 9.0D), ('g2', 2.0D, 3.0D), ('g2', 3.0D, 1.0D) AS t(g, x, y)

query
SELECT g, round(corr(x, y), 6) FROM ccv GROUP BY g

query
SELECT g, round(covar_pop(x, y), 6), round(covar_samp(x, y), 6) FROM ccv GROUP BY g

query
SELECT g, round(stddev_pop(y), 6), round(stddev_samp(y), 6), round(var_pop(y), 6), round(var_samp(y), 6) FROM ccv GROUP BY g

query
SELECT g, round(skewness(y), 4), round(kurtosis(y), 4) FROM ccv GROUP BY g
