-- raise_error / assert_true error paths.

query
SELECT assert_true(1 < 2)

query
SELECT assert_true(1 < 2, 'never shown') IS NULL

query expect_error(user_raised)
SELECT raise_error('boom')

query expect_error(assertion)
SELECT assert_true(1 > 2, 'one is not greater')
