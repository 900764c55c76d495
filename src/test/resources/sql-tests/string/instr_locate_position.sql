-- instr/locate/position are 1-based with 0 for absent; locate start offset.

query
SELECT instr('SparkSQL', 'SQL'), instr('SparkSQL', 'xyz'), instr('aaa', 'a'), instr('', 'a')

query
SELECT locate('a', 'banana'), locate('a', 'banana', 3), locate('a', 'banana', 99), locate('', 'abc')

query
SELECT position('an' IN 'banana'), position('' IN ''), instr(NULL, 'a'), locate('a', NULL)

query
SELECT locate('A', 'banana'), instr('banana', 'NA')
