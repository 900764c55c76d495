-- ceil/floor with target scale (Spark 3.3+ two-arg forms) on decimals and doubles.

query
SELECT ceil(2.1D), ceil(-2.1D), floor(2.9D), floor(-2.9D), ceiling(0.5D)

query
SELECT ceil(3.14159BD, 3), ceil(3.14159BD, 0), ceil(314.159BD, -2),
       floor(3.14159BD, 3), floor(314.159BD, -2)

query
SELECT ceil(CAST('NaN' AS DOUBLE)), floor(CAST('Infinity' AS DOUBLE)), ceil(NULL), floor(NULL)

query
SELECT ceil(9223372036854775807), floor(-9223372036854775808)
