-- concat_ws skips NULLs (unlike concat which propagates), array args.

query
SELECT concat('a', 'b', 'c'), concat('a', NULL, 'c'), concat(''), concat(NULL)

query
SELECT concat_ws('-', 'a', 'b'), concat_ws('-', 'a', NULL, 'c'), concat_ws('-', NULL, NULL)

query
SELECT concat_ws('-'), concat_ws(NULL, 'a', 'b'), concat_ws('', 'x', 'y')

query
SELECT concat_ws(',', array('a', 'b'), 'c'), concat_ws(',', array('a', NULL, 'b'))
