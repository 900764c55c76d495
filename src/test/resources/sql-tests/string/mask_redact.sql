-- mask default and custom replacement chars per character class.

query
SELECT mask('AbCD123-@$#'), mask('abcd-EFGH-8765-4321')

query
SELECT mask('AbCD123-@$#', 'Q'), mask('AbCD123-@$#', 'Q', 'q'), mask('AbCD123-@$#', 'Q', 'q', 'd'),
       mask('AbCD123-@$#', 'Q', 'q', 'd', 'o')

query
SELECT mask(NULL), mask(''), mask('nodigits'), mask('1234', NULL, NULL, NULL, NULL)
