-- width_bucket boundary assignment; factorial domain 0..20.

query
SELECT width_bucket(5.0D, 0.0D, 10.0D, 5), width_bucket(0.0D, 0.0D, 10.0D, 5),
       width_bucket(10.0D, 0.0D, 10.0D, 5), width_bucket(-1.0D, 0.0D, 10.0D, 5),
       width_bucket(11.0D, 0.0D, 10.0D, 5)

query
SELECT width_bucket(5.0D, 10.0D, 0.0D, 5), width_bucket(NULL, 0.0D, 10.0D, 5)

query
SELECT factorial(0), factorial(1), factorial(5), factorial(20), factorial(21), factorial(NULL)

query
SELECT factorial(-1)
