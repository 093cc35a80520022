"""Cross-engine ROUND stabilization for the DuckDB oracles.

Spark's ``round()`` on a double goes through Java ``BigDecimal.valueOf``,
i.e. it rounds the SHORTEST DECIMAL REPRESENTATION of the double
(HALF_UP). DuckDB's ``round()`` works on the binary double directly, so a
value whose shortest repr is ``4201.315`` (stored as 4201.31499999...)
rounds to 4201.32 in Spark but 4201.31 in DuckDB.

:func:`dround` makes the oracle reproduce Spark exactly: cast the double
to VARCHAR (DuckDB also prints the shortest repr), re-cast to DECIMAL
(exact), round (ties-away = HALF_UP for DECIMAL), and cast back to DOUBLE
so result dtypes match.

Only needed where the true value can tie at the rounding digit — averages,
medians and count-ratios of 2-decimal inputs. Sums of 2-decimal values and
irrational outputs (stddev, cosine) can keep plain ROUND.
"""


def dround(expr: str, n: int) -> str:
    return (
        f"CAST(ROUND(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,15)), {n}) "
        f"AS DOUBLE)"
    )
