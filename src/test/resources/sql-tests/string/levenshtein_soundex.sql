-- levenshtein (with threshold arg) and soundex phonetic codes.

query
SELECT levenshtein('kitten', 'sitting'), levenshtein('', 'abc'), levenshtein('same', 'same')

query
SELECT levenshtein('abc', 'abd', 1), levenshtein('abc', 'xyz', 1), levenshtein(NULL, 'a')

query
SELECT soundex('Robert'), soundex('Rupert'), soundex('Tymczak'), soundex(''), soundex(NULL)

query
SELECT soundex('Pfister'), levenshtein('flaw', 'lawn')
