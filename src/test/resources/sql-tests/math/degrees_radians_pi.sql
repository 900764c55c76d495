-- degrees/radians round-trips and pi/e constants.

query
SELECT pi(), e(), degrees(pi()), radians(180.0D)

query
SELECT degrees(radians(90.0D)), radians(degrees(1.0D)), degrees(0.0D), radians(-0.0D)

query
SELECT degrees(CAST('Infinity' AS DOUBLE)), radians(CAST('NaN' AS DOUBLE)), degrees(NULL)

statement
CREATE OR REPLACE TEMP VIEW t_deg AS SELECT * FROM VALUES (0.0D), (45.0D), (90.0D), (360.0D), (-720.0D) AS t(d)

query
SELECT d, abs(degrees(radians(d)) - d) < 1e-9 FROM t_deg
