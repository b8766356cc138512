"""Explicit key-salting for pathologically skewed joins (SURVEY.md §4 /
driver scale guidance: "skewed keys -> salting or AQE skew-join").

AQE's skew-join splitting handles moderate skew by splitting oversized
shuffle partitions, but it only helps sort-merge joins and cannot split a
single key's hash bucket across executors when one key holds a double-digit
percentage of the fact (the null-island / default-value key problem).
Salting fixes that shape explicitly:

- the BIG side gets a deterministic pseudo-random salt in [0, salt) from a
  row-content hash — the hot key's rows spread over `salt` buckets;
- the SMALL side is replicated `salt` times (explode over the salt range),
  so every (key, salt) bucket still finds its match;
- the join key becomes (key..., _salt); the output is identical to the
  unsalted join, with `salt`x the small side's shuffle volume as the price.

Supported join types: inner and left (the big side is row-preserved;
right/full would need the salt on the other side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                how: str = "inner", salt: int = 16) -> DataFrame:
    """Join `big` to `small` on `on`, spreading each big-side key over
    `salt` buckets. Result rows are exactly those of `big.join(small, on,
    how)`; only the physical distribution differs.

    Guards: non-key column overlap between the sides would only surface as
    an ambiguous-reference error downstream of the join, so it is rejected
    up front; the internal salt column name is chosen to not collide with
    either side's columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    overlap = (set(big.columns) & set(small.columns)) - set(on)
    if overlap:
        raise ValueError(
            "salted_join: non-key columns present on BOTH sides would be "
            f"ambiguous after the join: {sorted(overlap)}; rename or drop "
            "them on one side")
    salt_col = SALT_COL
    while salt_col in big.columns or salt_col in small.columns:
        salt_col = "_" + salt_col
    # content hash over the non-key columns too: rows of the SAME hot key
    # spread uniformly, and the salt is deterministic across task retries
    b = big.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
               F.lit(salt)).cast("int"),
    )
    s = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, [*on, salt_col], how).drop(salt_col)
