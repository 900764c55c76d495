-- overlay replaces by position/length, including binary variant.

query
SELECT overlay('SparkSQL' PLACING '_' FROM 6), overlay('SparkSQL' PLACING 'CORE' FROM 7),
       overlay('SparkSQL' PLACING 'ANSI ' FROM 7 FOR 0)

query
SELECT overlay('Spark' PLACING 'XY' FROM 1 FOR 3), overlay('abc' PLACING 'Z' FROM 10)

query
SELECT overlay(NULL PLACING 'x' FROM 1), overlay('abc' PLACING NULL FROM 2)
