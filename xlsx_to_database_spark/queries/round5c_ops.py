"""Round-5 additions, third module (late-round batches).

Registered after round5b_ops so these queue behind everything already
waiting for a driver window: VACUUM on the txn-log table format (the
retention half of time travel), the RSI momentum oscillator (windowed
finance family beside OHLC/VWAP/drawdown), and the distributed
reservoir sample (per-group top-k by deterministic hash — the pattern
that replaces driver-side reservoirs at cluster scale).

Oracle discipline (SURVEY.md §5): decimal sufficient statistics on both
engines; any floating-point step is an identical final expression over
identical inputs, so the driver's value-hash comparison stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xlsx_to_database_spark.catalog import table
from xlsx_to_database_spark.registry import query


@query(
    "table_vacuum",
    """
    WITH merged AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey BETWEEN 200 AND 299
                  THEN CAST(2 * CAST(o_totalprice AS DECIMAL(18,2))
                            AS DECIMAL(18,2))
                  ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
      FROM orders
    )
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(price) AS DOUBLE), 2) AS total
    FROM merged GROUP BY o_orderstatus
    """,
)
def table_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM on the txn-log table: create (v0 = orders, range-clustered
    into 4 files) → MERGE a doubled-price slice (v1 — copy-on-write
    rewrites ONLY the files whose stats range intersects [200, 299],
    carrying the rest by reference) → VACUUM retaining just the newest
    version. Vacuum deletes exactly the files referenced by v0 alone
    (the pre-merge images of the rewritten files); the files v1 carried
    by reference survive because liveness is computed over RETAINED
    MANIFESTS, not over version ancestry. The final read must
    hash-match the logical merge result — proving vacuum is physical
    garbage collection with zero logical effect.

    Scale shape: liveness is a driver-side set over manifest entries
    (O(files), metadata); deletion is file-system unlink, no data scan.
    This is Delta VACUUM's exact trade — time-travel horizon = retention
    — and the missing maintenance half without which every MERGE leaks
    its pre-images forever (a 100 TB table under daily upserts doubles
    its storage in weeks without it)."""
    import shutil

    from xlsx_to_database_spark.operators.txn_table import TxnTable
    from xlsx_to_database_spark.queries.sources_sinks import _tag

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    root = f"/tmp/spark_stage/{_tag(sf_dir)}_table_vacuum"
    shutil.rmtree(root, ignore_errors=True)
    tt = TxnTable(spark, root, "o_orderkey")
    tt.create(o.repartitionByRange(4, "o_orderkey"))
    src = o.filter(F.col("o_orderkey").between(200, 299)).withColumn(
        "price", (F.lit(2) * F.col("price")).cast("decimal(18,2)")
    )
    _, rewritten, carried = tt.merge(src, "o_orderkey")
    assert rewritten >= 1 and carried >= 1, "merge must prune files"
    deleted, kept = tt.vacuum(retain_versions=1)
    assert deleted >= 1, "vacuum must collect the merge's pre-images"
    return tt.read().groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("price").cast("double"), 2).alias("total"),
    )


_RSI_N = 14  #: lookback periods (the standard RSI-14)


@query(
    "win_rsi",
    f"""
    WITH px AS (
      SELECT o_custkey, o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p,
             CAST(o_totalprice AS DECIMAL(18,2))
               - lag(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS d,
             row_number() OVER w AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)
    ), g AS (
      SELECT o_custkey, o_orderkey, rn,
             sum(CASE WHEN d > 0 THEN d ELSE CAST(0 AS DECIMAL(18,2)) END)
               OVER f AS gain,
             sum(CASE WHEN d < 0 THEN -d ELSE CAST(0 AS DECIMAL(18,2)) END)
               OVER f AS loss
      FROM px
      WINDOW f AS (PARTITION BY o_custkey
                   ORDER BY rn
                   ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT o_custkey, o_orderkey,
           round(100.0 * CAST(gain AS DOUBLE)
                 / CAST(gain + loss AS DOUBLE), 6) AS rsi
    FROM g
    WHERE rn > {_RSI_N} AND gain + loss <> 0
    """,
)
def win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI-14 (Cutler's simple-average variant) per customer over their
    order-price series — the momentum oscillator beside `win_ohlc` /
    `win_rolling_vwap` / `win_drawdown` in the finance-window family.
    Delta = price − lag(price); RSI = 100·Σgain / (Σgain + Σloss) over
    the trailing 14 deltas, emitted only once the frame is full
    (rn > 14) and defined (some movement in the window).

    Exactness: prices and deltas are DECIMAL(18,2), so both windowed
    sums are exact integers-in-cents regardless of per-engine summation
    order; the one float step (the final ratio) is the identical
    expression over identical decimals on both sides.

    Scale shape: one shuffle on o_custkey feeds BOTH windows (same
    partitioning, same sort — Catalyst reuses the exchange and the
    sort), and the frame is ROWS-bounded so state per row is O(14).
    No global sort anywhere: the series is per-key, exactly how a
    1000-executor cluster wants tick data partitioned."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    p = F.col("o_totalprice").cast("decimal(18,2)")
    px = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        (p - F.lag(p).over(w)).alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    zero = F.lit(0).cast("decimal(18,2)")
    f = (
        Window.partitionBy("o_custkey")
        .orderBy("rn")
        .rowsBetween(-(_RSI_N - 1), 0)
    )
    g = px.select(
        "o_custkey", "o_orderkey", "rn",
        F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(zero))
        .over(f).alias("gain"),
        F.sum(F.when(F.col("d") < 0, -F.col("d")).otherwise(zero))
        .over(f).alias("loss"),
    )
    return g.filter(
        (F.col("rn") > _RSI_N) & (F.col("gain") + F.col("loss") != 0)
    ).select(
        "o_custkey", "o_orderkey",
        F.round(
            F.lit(100.0) * F.col("gain").cast("double")
            / (F.col("gain") + F.col("loss")).cast("double"),
            6,
        ).alias("rsi"),
    )


_RESERVOIR_K = 5  #: rows kept per group


@query(
    "sample_reservoir",
    f"""
    SELECT o_orderpriority, o_orderkey, o_custkey
    FROM (
      SELECT o_orderpriority, o_orderkey, o_custkey,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= {_RESERVOIR_K}
    """,
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group reservoir sample of k=5 orders per priority class —
    expressed as the distributed equivalent of reservoir sampling:
    top-k by a uniform random key. A driver-side reservoir is
    inherently sequential; ranking by a per-row hash gives the
    identical uniform-without-replacement distribution and
    parallelizes perfectly. The key is md5 of the row id, so the
    sample is deterministic and byte-identical across engines (both
    produce lowercase-hex md5 of the same decimal string) — unlike
    `sample_frac`/`sample_stratified`, which are RNG-seeded and
    rows-only.

    Scale shape: Spark 4 rewrites the rank-filter to WindowGroupLimit —
    each map task keeps a k-row heap per group BEFORE the shuffle, so
    the exchange carries ~k·groups·tasks rows, not the table; no full
    per-group sort materializes. That is exactly the reservoir-merge
    topology (partial reservoirs → merge) that makes this the 100 TB
    sampling pattern."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority", "o_orderkey", "o_custkey",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= _RESERVOIR_K)
        .drop("rn")
    )
