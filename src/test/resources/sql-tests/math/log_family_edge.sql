-- ln/log10/log2/log1p/log(base,x): zero, negative, base-1 edge behavior (NULL, not error).

query
SELECT ln(1.0D), ln(e()), log10(1000.0D), log2(8.0D), log1p(0.0D)

query
SELECT ln(0.0D), ln(-1.0D), log10(0.0D), log2(-2.0D), log1p(-1.0D), log1p(-2.0D)

query
SELECT log(2.0D, 8.0D), log(10.0D, 0.001D), log(1.0D, 5.0D), log(0.5D, 0.25D)

query
SELECT ln(NULL), log(NULL, 2.0D), log(2.0D, NULL), ln(CAST('Infinity' AS DOUBLE))
