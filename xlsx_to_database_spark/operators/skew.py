"""Skew-mitigation join: key salting (SURVEY.md §4 / SCALE.md §2.3).

AQE's skew-join split handles most skew at runtime, but pathological hot
keys (one key = 30% of a 100 TB fact table) still serialize into few
tasks. Salting is the classic static remedy: split each hot key's rows
across N sub-partitions by appending a salt to the join key on the big
side, and replicate the small side N times so every (key, salt) pair
still meets its match.

Semantically transparent — the join result is row-for-row identical to
the unsalted join — which is why `join_skew_salted` carries the *plain*
join SQL as its exact DuckDB oracle: the oracle proves the rewrite
changes only the distribution, never the answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
    entropy: Column | None = None,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``n_salts``
    sub-partitions.

    ``entropy`` is any expression that varies *within* a key's rows
    (defaults to a hash of the whole row via all columns) — it decides
    which salt bucket each big-side row lands in. The hash function
    never affects the result, only the partitioning, so determinism
    across engines is not required.

    The small side is replicated ``n_salts``× (an explode of a literal
    range — cheap for dimension-sized inputs; do NOT salt two huge
    sides against each other, split the hot keys out instead).
    """
    if entropy is None:
        entropy = F.xxhash64(*[F.col(c) for c in big.columns])
    big_s = big.withColumn(SALT_COL, F.pmod(entropy, F.lit(n_salts)).cast("int"))
    small_s = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = big_s.join(
        small_s,
        on=[big_s[big_key] == small_s[small_key], big_s[SALT_COL] == small_s[SALT_COL]],
        how=how,
    )
    return joined.drop(SALT_COL)
