-- Decimal literal typing and promotion rules.

query
SELECT typeof(1.0), typeof(1.0BD), typeof(CAST(1 AS DECIMAL(3,1))), typeof(1.0D)

query
SELECT 0.1BD + 0.2BD, 1.1BD * 1.1BD, typeof(0.1BD + 0.2BD)

query
SELECT CAST(1 AS DECIMAL(38,0)) + CAST(1 AS DECIMAL(38,0)), typeof(CAST(1 AS DECIMAL(38,0)) + 1)

query
SELECT round(123.456BD, 2), round(123.456BD, -1), ceil(1.1BD), floor(1.9BD)
