-- convert_timezone and session-timezone-independent shifts.

query
SELECT convert_timezone('UTC', 'America/Los_Angeles', TIMESTAMP'2023-01-15 12:00:00')

query
SELECT convert_timezone('Asia/Kolkata', 'UTC', TIMESTAMP'2023-06-15 05:30:00')

query
SELECT from_utc_timestamp(TIMESTAMP'2023-03-12 09:30:00', 'America/Los_Angeles'),
       to_utc_timestamp(TIMESTAMP'2023-03-12 01:30:00', 'America/Los_Angeles')

query
SELECT hour(convert_timezone('UTC', 'Australia/Sydney', TIMESTAMP'2023-01-01 00:00:00'))
