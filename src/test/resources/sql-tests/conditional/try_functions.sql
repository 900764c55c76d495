-- The try_* family: NULL instead of runtime errors.

query
SELECT try_add(2147483647, 1), try_subtract(-2147483648, 1), try_multiply(9223372036854775807L, 2)

query
SELECT try_divide(1, 0), try_divide(1.0D, 0.0D), try_divide(CAST(10.0 AS DECIMAL(5,1)), 0)

query
SELECT try_element_at(array(1, 2), 5), try_element_at(array(1, 2), 1), try_element_at(map('a', 1), 'z')

query
SELECT try_to_number('$1,234.56', '$9,999.99'), try_to_number('bad', '999')

query
SELECT CAST(try_to_binary('4D', 'hex') AS STRING), try_to_binary('!!', 'base64') IS NULL
