-- format_number grouping/rounding and format_string printf forms.

query
SELECT format_number(12345.6789D, 2), format_number(1234567, 0), format_number(0.1D, 4)

query
SELECT format_number(-9876.543D, 1), format_number(12345.6789D, '#,###.##'), format_number(NULL, 2)

query
SELECT format_string('%d-%s', 7, 'x'), format_string('%05d', 42), format_string('%.3f', 2.5D)

query
SELECT format_string('%x', 255), format_string('%%'), format_string('%s', CAST(NULL AS STRING)), printf('%b', true)
