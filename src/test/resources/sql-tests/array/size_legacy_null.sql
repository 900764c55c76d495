-- Config: spark.sql.ansi.enabled=false
-- Config: spark.sql.legacy.sizeOfNull=true
-- Legacy mode: size(NULL) = -1 (pre-3.0 compatibility), needs ANSI off.

query
SELECT size(CAST(NULL AS ARRAY<INT>)), size(CAST(NULL AS MAP<INT, STRING>))

query
SELECT size(array(1)), size(CAST(array() AS ARRAY<INT>))
