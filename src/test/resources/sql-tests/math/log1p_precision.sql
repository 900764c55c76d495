-- log1p: precision near zero (log(1+x) loses all digits at 1e-15; log1p
-- keeps them), domain edge at -1, null passthrough.

query
SELECT log1p(0D), log1p(1D), log1p(exp(1D) - 1D)

query
SELECT log1p(1e-15D), log(1D + 1e-15D), log1p(1e-15D) = 1e-15D

query
SELECT log1p(-0.5D), log1p(-0.999999D)

query
SELECT log1p(NULL), log1p(CAST(1 AS INT)), log1p(0.5BD)

query
SELECT ln(exp(2D)), log(2D, 8D), log10(1000D), log2(1024D)
