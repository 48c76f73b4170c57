"""Distributed global-order windows (rank / ntile / running sums).

A ``Window.orderBy(...)`` with no partition spec is the one window shape
that does NOT scale: Spark moves every row to a single task
(``WindowExec: No Partition Defined`` warning), so a global rank over a
100 TB fact table funnels 100 TB through one executor thread. But global
rank/ntile/cumulative sums are order-decomposable, so the exact result
is computable with a partitioned window plus per-partition offsets:

1. collect B-1 approximate quantile boundaries of a numeric *driving*
   order key (``approxQuantile`` — driver-side metadata, ~KB; boundary
   placement only affects load balance, never the result);
2. bucket every row by comparison against the literal boundaries — pure
   codegen, deterministic across re-evaluations (no reliance on
   exchange reuse), zero shuffle;
3. aggregate per-bucket totals (B rows), turn them into exclusive
   prefix offsets with a B-row window, broadcast-join them back;
4. run the window partitioned BY BUCKET and add the offset.

The heavy sort now parallelizes across B partitions and no task ever
materializes more than ~1/B of the data — same exact answer as the
single-partition plan. Skewed driving keys collapse buckets (equal
boundaries are deduped), degrading parallelism gracefully rather than
breaking correctness.

Requirements: the driving key must be the leading, ascending,
non-null order key (ties within one driving value always land in one
bucket, so secondary tie-break columns are safe).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BKT = "__gbkt"


def _boundaries(df: DataFrame, driving: str, n_buckets: int) -> list[float]:
    """Approximate, deduped, strictly-increasing bucket boundaries."""
    if n_buckets < 2:
        return []
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # Loose relative error: boundary placement affects only load balance,
    # never the result, so the cheapest sketch pass wins.
    raw = df.stat.approxQuantile(driving, probs, 0.01)
    out: list[float] = []
    for b in raw:
        if not out or b > out[-1]:
            out.append(b)
    return out


def _with_bucket(df: DataFrame, driving: str, bounds: list[float]) -> DataFrame:
    """Bucket id = number of boundaries <= driving value (codegen only).

    Spelled as a plain sum-of-CASE-WHEN expression tree rather than a
    higher-order ``F.aggregate`` lambda: this column becomes a grouping
    key, and Catalyst's filter pushdown re-binds grouping-key expressions
    across the Aggregate — lambda variables inside a HOF break that
    re-binding (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at execution time on
    some plan shapes). A ~B-term when-chain is ordinary codegen math."""
    if not bounds:
        return df.withColumn(_BKT, F.lit(0))
    bkt = F.lit(0)
    for b in bounds:
        bkt = bkt + F.when(F.col(driving) >= F.lit(float(b)), 1).otherwise(0)
    return df.withColumn(_BKT, bkt)


def _exclusive_offsets(totals: DataFrame, value_cols: dict[str, str]) -> DataFrame:
    """Exclusive prefix sums per bucket, computed WITHOUT a window: a
    lower-triangle self-join over the bucket totals (<= n_buckets rows,
    so at most B^2 ~ 4k joined rows — metadata scale). A window here
    would itself be an unpartitioned WindowExec; Catalyst prunes foldable
    partition keys, so there is no way to spell a warning-free
    single-partition window — and none is needed at B rows.

    ``value_cols``: out_name -> totals column to prefix-sum."""
    lower = totals.select(
        F.col(_BKT).alias("__lo"),
        *[F.col(c).alias(f"__v_{o}") for o, c in value_cols.items()],
    )
    return (
        totals.select(_BKT)
        .join(lower, F.col("__lo") < F.col(_BKT), "left")
        .groupBy(_BKT)
        .agg(
            *[
                F.coalesce(F.sum(f"__v_{o}"), F.lit(0)).alias(o)
                for o in value_cols
            ]
        )
    )


def with_global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    driving: str,
    out: str = "rn",
    n_buckets: int = 64,
) -> DataFrame:
    """Exact global 1-based row_number over ``order_cols`` (leading key =
    ``driving`` ascending), computed with a bucket-partitioned window."""
    b = _with_bucket(df, driving, _boundaries(df, driving, n_buckets))
    counts = b.groupBy(_BKT).agg(F.count(F.lit(1)).alias("__cnt"))
    offs = _exclusive_offsets(counts, {"__off": "__cnt"})
    w = Window.partitionBy(_BKT).orderBy(*order_cols)
    return (
        b.join(F.broadcast(offs), _BKT)
        .withColumn(out, (F.row_number().over(w) + F.col("__off")).cast("long"))
        .drop(_BKT, "__off")
    )


def with_global_running_sums(
    df: DataFrame,
    order_cols: list[Column],
    driving: str,
    sums: dict[str, str],
    n_buckets: int = 64,
) -> DataFrame:
    """Exact global inclusive running sums (ROWS UNBOUNDED PRECEDING ..
    CURRENT ROW) for each ``out_name -> source_column`` in ``sums``."""
    b = _with_bucket(df, driving, _boundaries(df, driving, n_buckets))
    totals = b.groupBy(_BKT).agg(
        *[F.sum(c).alias(f"__t_{o}") for o, c in sums.items()]
    )
    offs = _exclusive_offsets(totals, {f"__o_{o}": f"__t_{o}" for o in sums})
    w = (
        Window.partitionBy(_BKT)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    res = b.join(F.broadcast(offs), _BKT)
    for o, c in sums.items():
        res = res.withColumn(o, F.sum(c).over(w) + F.col(f"__o_{o}"))
    return res.drop(_BKT, *[f"__o_{o}" for o in sums])


def with_global_ntile(
    df: DataFrame,
    order_cols: list[Column],
    driving: str,
    n: int,
    out: str = "bucket",
    n_buckets: int = 64,
    total: Optional[Column] = None,
) -> DataFrame:
    """Exact SQL ``ntile(n)`` over a global order, distributed. The first
    ``total % n`` buckets get one extra row — replicated arithmetically
    from the global row number, matching every engine's ntile."""
    rn = with_global_row_number(df, order_cols, driving, out="__grn", n_buckets=n_buckets)
    tot = df.agg(F.count(F.lit(1)).alias("__tot"))
    res = rn.crossJoin(F.broadcast(tot))
    q = F.floor(F.col("__tot") / n)
    r = F.col("__tot") % n
    cut = r * (q + 1)
    g = F.col("__grn")
    bucket = F.when(g <= cut, F.floor((g - 1) / (q + 1)) + 1).otherwise(
        r + F.floor((g - cut - 1) / q) + 1
    )
    return res.withColumn(out, bucket.cast("int")).drop("__grn", "__tot")
