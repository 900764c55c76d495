-- elt (1-based variadic pick) and sentences tokenizer.

query
SELECT elt(1, 'a', 'b', 'c'), elt(3, 'a', 'b', 'c'), elt(CAST(NULL AS INT), 'a', 'b')

query
SELECT try_element_at(array('a', 'b'), 4), elt(2, 'x', NULL, 'z')

query
SELECT sentences('Hello there! How are you?'), sentences(''), sentences(NULL)

query expect_error(elt_out_of_range_ansi)
SELECT elt(5, 'a', 'b')
