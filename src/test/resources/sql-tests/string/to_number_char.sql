-- Numeric formatting: to_number parsing, to_char rendering.

query
SELECT to_number('1234', '9999'), to_number('-1,234.56', 'S9,999.99'), to_number('$99.50', '$99.99')

query
SELECT to_char(1234.56, '9,999.99'), to_char(0.5, '0.00'), to_char(-7, 'S9')

query
SELECT to_char(DATE'2023-07-09', 'yyyy-MM-dd'), to_char(TIMESTAMP'2023-07-09 01:02:03', 'HH:mm')

query expect_error(parse_fail)
SELECT to_number('abc', '999')
