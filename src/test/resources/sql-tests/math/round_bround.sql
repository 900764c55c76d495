-- round (HALF_UP) vs bround (HALF_EVEN) on doubles and decimals, negative scale.

query
SELECT round(2.5D), round(3.5D), round(-2.5D), bround(2.5D), bround(3.5D), bround(-2.5D)

query
SELECT round(123.456D, 2), round(123.456D, -1), round(123.456D, 0),
       bround(0.25D, 1), bround(0.35D, 1)

query
SELECT round(2.5BD), bround(2.5BD), round(2.45BD, 1), bround(2.45BD, 1)

query
SELECT round(CAST('NaN' AS DOUBLE)), round(CAST('Infinity' AS DOUBLE), 2), round(NULL, 1)

query
SELECT round(9.995D, 2), bround(9.995D, 2)
