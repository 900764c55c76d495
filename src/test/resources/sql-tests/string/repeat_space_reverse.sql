-- repeat/space/reverse with zero/negative counts and multibyte strings.

query
SELECT repeat('ab', 3), repeat('ab', 0), repeat('ab', -1), repeat('', 5), repeat(NULL, 2)

query
SELECT space(3), space(0), space(-2), length(space(7)), space(NULL)

query
SELECT reverse('abc'), reverse(''), reverse('日本語'), reverse(NULL)

query
SELECT reverse(array(1, 2, 3)), repeat('x', CAST(NULL AS INT))
