-- luhn_check, printf/format_string, char/chr.

query
SELECT luhn_check('79927398713'), luhn_check('79927398714'), luhn_check('not-digits')

query
SELECT printf('%d items at %.2f', 3, 1.5D), printf('%s|%s', 'a', NULL), printf('%05d', 42)

query
SELECT char(65), chr(0), chr(97.9)

query
SELECT format_string('%x', 255), format_string('%o', 8), format_string('%e', 12345.678D)
