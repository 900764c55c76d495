-- Maps with array/struct values; nested lookups.

statement
CREATE OR REPLACE TEMP VIEW mnv AS
SELECT map('tags', array('a', 'b'), 'more', array('c')) AS ma,
       map('p', named_struct('x', 1, 'y', 'one')) AS ms

query
SELECT element_at(ma, 'tags'), size(element_at(ma, 'tags')), element_at(ma, 'tags')[0] FROM mnv

query
SELECT element_at(ms, 'p').x, element_at(ms, 'p').y FROM mnv

query
SELECT array_join(flatten(map_values(ma)), ','), map_keys(ms) FROM mnv

query
SELECT transform_values(ma, (k, v) -> size(v)) FROM mnv
