-- from_unixtime / unix_timestamp round trips with explicit patterns (UTC session).

query
SELECT from_unixtime(0), from_unixtime(86400, 'yyyy-MM-dd'), from_unixtime(1723200000, 'yyyy-MM-dd HH:mm:ss')

query
SELECT unix_timestamp(TIMESTAMP '1970-01-02 00:00:00'), unix_timestamp(DATE '1970-01-02'),
       unix_timestamp('2024-08-09 10:00:00', 'yyyy-MM-dd HH:mm:ss')

query
SELECT from_unixtime(unix_timestamp('09/08/2024', 'dd/MM/yyyy'), 'yyyy-MM-dd'),
       from_unixtime(NULL), unix_timestamp(NULL)

query
SELECT to_unix_timestamp('2024-08-09', 'yyyy-MM-dd'), from_unixtime(-1)
