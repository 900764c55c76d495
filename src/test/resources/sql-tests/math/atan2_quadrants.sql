-- atan2 in all four quadrants plus axis and zero-zero conventions.

query
SELECT atan2(1.0D, 1.0D), atan2(1.0D, -1.0D), atan2(-1.0D, 1.0D), atan2(-1.0D, -1.0D)

query
SELECT atan2(0.0D, 1.0D), atan2(0.0D, -1.0D), atan2(1.0D, 0.0D), atan2(-1.0D, 0.0D)

query
SELECT atan2(0.0D, 0.0D), atan2(-0.0D, 0.0D), atan2(0.0D, -0.0D)

query
SELECT atan2(CAST('NaN' AS DOUBLE), 1.0D), atan2(NULL, 1.0D), atan2(1.0D, NULL)
