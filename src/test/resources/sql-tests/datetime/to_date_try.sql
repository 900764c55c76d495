-- to_date/to_timestamp with patterns; try_to_date/try_to_timestamp on invalid input.

query
SELECT to_date('2024-08-09'), to_date('09/08/2024', 'dd/MM/yyyy'), to_date('2024-239', 'yyyy-DDD')

query
SELECT try_to_date('2024-13-45'), try_to_date('garbage'), try_to_date('2024-08-09'),
       try_to_timestamp('not a time'), try_to_timestamp('2024-08-09 10:11:12')

query
SELECT to_timestamp('2024-08-09 10:11:12.123', 'yyyy-MM-dd HH:mm:ss.SSS'),
       to_timestamp('08.09.2024 10:11', 'MM.dd.yyyy HH:mm')

query
SELECT to_date(NULL), try_to_date(NULL), to_timestamp(NULL)

query expect_error(unparsable_ansi)
SELECT to_date('2024-13-45')
