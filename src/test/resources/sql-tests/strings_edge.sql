-- Empty strings, unicode, boundary positions
SELECT s, length(s) AS len, upper(s) AS up, reverse(s) AS rev, trim(s) AS tr
FROM VALUES (''), ('  a  '), ('héllo'), ('﻿bom') AS t(s)
ORDER BY s;
SELECT substring('abcdef', 0, 2) AS sub0, substring('abcdef', -2, 2) AS subneg,
       substring('abcdef', 7, 1) AS oob, lpad('x', 0, '-') AS lp0, repeat('ab', 0) AS rep0;
SELECT split('a,,b', ',') AS sp, concat_ws('-', 'a', CAST(NULL AS STRING), 'b') AS cw;
