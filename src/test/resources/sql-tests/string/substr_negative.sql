-- substring negative start, zero start convention, beyond-length, for-length forms.

query
SELECT substring('Spark', 2), substring('Spark', 2, 2), substring('Spark', -3), substring('Spark', -3, 2)

query
SELECT substring('Spark', 0), substring('Spark', 0, 3), substring('Spark', 10), substring('Spark', 1, 0)

query
SELECT substr('Spark' FROM 2), substr('Spark' FROM 2 FOR 3), substr('Spark' FROM -2)

query
SELECT substring(NULL, 1), substring('abc', NULL), substring('abc', 1, NULL), substring('日本語です', 2, 2)
