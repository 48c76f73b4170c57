"""ETL lifecycle operators — the reference's home turf (it is an
xlsx→database ETL tool) re-expressed as distributed, restartable Spark
jobs: upsert/merge, data-quality gating, layout-optimized writes, and
stratified sampling.

Scale notes:
- ``etl_upsert`` is the MERGE-without-a-table-format pattern: a full
  outer join on the business key, source side winning per column. One
  shuffle on the key (or zero against bucketed storage, cf.
  `join_bucketed`); no driver-side diffing.
- ``dq_checks`` runs every audit as an aggregate over ONE pass of each
  table — counting violations, never collecting them. The orphan check
  is a broadcast-able anti join, not a lookup loop.
- ``parquet_clustered_sink`` is the write-side half of data skipping:
  range-partition + sort-within-partitions gives files DISJOINT key
  ranges and narrow row-group min/max stats, so a later predicate scan
  prunes whole files from the footer alone (asserted with pyarrow in
  tests/test_operators.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xlsx_to_database_spark.catalog import table
from xlsx_to_database_spark.registry import query

_STAGE_ROOT = "/tmp/spark_stage"


def _updates_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic simulated change batch: every 7th customer gets a
    credit (changed row), every 100th spawns a new account (insert)."""
    c = table(spark, sf_dir, "customer")
    changed = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        "c_mktsegment",
    )
    # Insert keys offset far past any real custkey (1.5M at sf=10): a
    # small offset would collide with existing keys at larger SFs,
    # putting duplicate keys in the batch — a MERGE real engines reject.
    inserted = c.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + 100_000_000).alias("c_custkey"),
        F.concat(F.lit("Customer#new"), F.col("c_custkey").cast("string")).alias(
            "c_name"
        ),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    return changed.unionByName(inserted)


@query(
    "etl_upsert",
    """
    WITH updates AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
               c_mktsegment
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey + 100000000,
               concat('Customer#new', CAST(c_custkey AS VARCHAR)),
               c_nationkey, 0.0, c_mktsegment
        FROM customer WHERE c_custkey % 100 = 0
    )
    SELECT coalesce(u.c_custkey, t.c_custkey)       AS c_custkey,
           coalesce(u.c_name, t.c_name)             AS c_name,
           coalesce(u.c_nationkey, t.c_nationkey)   AS c_nationkey,
           coalesce(u.c_acctbal, t.c_acctbal)       AS c_acctbal,
           coalesce(u.c_mktsegment, t.c_mktsegment) AS c_mktsegment
    FROM customer t FULL OUTER JOIN updates u ON t.c_custkey = u.c_custkey
    """,
)
def etl_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-1 upsert (MERGE) without a table format: target FULL
    OUTER JOIN updates on the business key, update side winning via
    coalesce — updates overwrite, inserts append, untouched rows pass
    through. Distributed end to end: one key shuffle, no driver diffing;
    at 100 TB the update batch is usually broadcast-size, collapsing the
    whole merge into a map-side join plus a pass-through."""
    t = table(spark, sf_dir, "customer").alias("t")
    u = _updates_batch(spark, sf_dir).alias("u")
    joined = t.join(u, F.col("t.c_custkey") == F.col("u.c_custkey"), "full_outer")
    return joined.select(
        *[
            F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c)
            for c in ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        ]
    )


@query(
    "dq_checks",
    """
    SELECT 'customer_null_name' AS check_name,
           CAST(count(*) FILTER (WHERE c_name IS NULL) AS BIGINT) AS violations,
           CAST(count(*) AS BIGINT) AS rows_checked
    FROM customer
    UNION ALL
    SELECT 'customer_unique_key',
           CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT), CAST(count(*) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'lineitem_discount_domain',
           CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_unique_line',
           CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_orphan_orders',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    """,
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: null checks, key uniqueness, value domains,
    and referential integrity, each reported as (check, violations,
    rows_checked). Every check is an AGGREGATE — violations are counted
    where they live, never collected; the orphan check is a left-anti
    join that AQE turns into a broadcast when orders' key set is small
    enough, and a shuffled anti join otherwise."""
    c = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def check(name: str, df: DataFrame, violation_count: F.Column) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            violation_count.cast("long").alias("violations"),
            F.count("*").cast("long").alias("rows_checked"),
        )

    null_name = check(
        "customer_null_name", c, F.count(F.when(F.col("c_name").isNull(), 1))
    )
    uniq_cust = check(
        "customer_unique_key", c, F.count("*") - F.countDistinct("c_custkey")
    )
    domain = check(
        "lineitem_discount_domain",
        li,
        F.count(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)),
    )
    uniq_line = check(
        "lineitem_unique_line",
        li,
        F.count("*") - F.countDistinct("l_orderkey", "l_linenumber"),
    )
    orphans = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").cast("long").alias("violations"))
        .crossJoin(li.agg(F.count("*").cast("long").alias("rows_checked")))
        .select(
            F.lit("lineitem_orphan_orders").alias("check_name"),
            "violations",
            "rows_checked",
        )
    )
    return null_name.unionByName(uniq_cust).unionByName(domain).unionByName(
        uniq_line
    ).unionByName(orphans)


@query(
    "parquet_clustered_sink",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           o_orderpriority
    FROM orders
    """,
)
def parquet_clustered_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-optimized parquet write: `repartitionByRange` on the
    cluster key gives every output file a DISJOINT o_orderdate range,
    and `sortWithinPartitions` keeps row-group min/max stats narrow —
    so a later date-predicate scan prunes whole files from footers
    alone. This is the write-side half of data skipping; the pyarrow
    footer-stat assertions live in tests/test_operators.py. Read-back
    round trip is byte-exact vs the source table."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(_STAGE_ROOT, f"{tag}_orders_clustered")
    o = table(spark, sf_dir, "orders")
    (
        o.repartitionByRange(4, "o_orderdate")
        .sortWithinPartitions("o_orderdate", "o_orderkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    )


@query("sample_stratified")  # rows-only: sampling RNG not reproducible in DuckDB
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-key) Bernoulli sampling via `sampleBy`: different
    keep-rates per return flag — the downsample-the-majority-class shape
    used to rebalance training mixes. Seeded and partition-deterministic;
    a map-only operator (each task coin-flips its own rows, no shuffle).
    Proportion tolerances are asserted in tests/test_operators.py."""
    li = table(spark, sf_dir, "lineitem")
    sampled = li.sampleBy(
        "l_returnflag", fractions={"A": 0.1, "N": 0.02, "R": 0.1}, seed=42
    )
    return sampled.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )


@query(
    "etl_scd2",
    """
    WITH h AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
               lag(o_orderpriority) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders
    ), marked AS (
        SELECT *, CASE WHEN prev IS NULL OR prev <> o_orderpriority
                       THEN 1 ELSE 0 END AS chg
        FROM h
    ), runs AS (
        SELECT o_custkey, o_orderdate, o_orderpriority,
               CAST(sum(chg) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS version
        FROM marked
    )
    SELECT o_custkey, o_orderpriority AS state, version,
           min(o_orderdate) AS valid_from,
           max(o_orderdate) AS valid_to,
           CAST(count(*) AS BIGINT) AS n_obs
    FROM runs
    GROUP BY o_custkey, o_orderpriority, version
    """,
)
def etl_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history build: collapse each customer's order-priority
    observation stream into versioned validity intervals — lag marks
    state changes, a running sum numbers the versions (gaps-and-islands
    again, but keyed by attribute change rather than time gap), and a
    grouped min/max yields [valid_from, valid_to]. Three window passes
    share ONE shuffle+sort on custkey (identical partition+order), then
    one aggregate; no self-joins, no driver-side history walking."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("o_orderpriority").over(w)
    marked = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_orderpriority",
        F.when(prev.isNull() | (prev != F.col("o_orderpriority")), 1)
        .otherwise(0)
        .alias("chg"),
    )
    runs = marked.select(
        "o_custkey",
        "o_orderdate",
        "o_orderpriority",
        F.sum("chg").over(run).alias("version"),
    )
    return (
        runs.groupBy("o_custkey", F.col("o_orderpriority").alias("state"), "version")
        .agg(
            F.min("o_orderdate").alias("valid_from"),
            F.max("o_orderdate").alias("valid_to"),
            F.count("*").alias("n_obs"),
        )
        .select("o_custkey", "state", "version", "valid_from", "valid_to", "n_obs")
    )


@query(
    "profile_table",
    """
    SELECT 'o_orderkey' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(o_orderkey) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_val,
           CAST(max(o_orderkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(round(min(o_totalprice), 2) AS VARCHAR),
           CAST(round(max(o_totalprice), 2) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(count(o_orderpriority) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
    FROM orders
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the first thing an ingest tool (the reference's
    xlsx→database class) runs on arrival: per-column row/non-null/
    distinct counts and min/max, emitted as one row per column. ONE scan
    computes every column's stats simultaneously (a single aggregate
    with all the counters side-by-side, unpivoted after) — never one
    pass per column, which at 100 TB turns profiling into N full scans.
    min/max stringified so heterogeneous column types stack in one
    result."""
    o = table(spark, sf_dir, "orders")
    # All stats in ONE aggregate row...
    agg = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[
            e
            for c in ("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
            for e in (
                F.count(F.col(c)).cast("long").alias(f"{c}__nn"),
                F.countDistinct(F.col(c)).cast("long").alias(f"{c}__nd"),
            )
        ],
        F.min("o_orderkey").cast("string").alias("o_orderkey__min"),
        F.max("o_orderkey").cast("string").alias("o_orderkey__max"),
        F.min("o_orderstatus").cast("string").alias("o_orderstatus__min"),
        F.max("o_orderstatus").cast("string").alias("o_orderstatus__max"),
        F.round(F.min("o_totalprice"), 2).cast("string").alias("o_totalprice__min"),
        F.round(F.max("o_totalprice"), 2).cast("string").alias("o_totalprice__max"),
        F.min("o_orderpriority").cast("string").alias("o_orderpriority__min"),
        F.max("o_orderpriority").cast("string").alias("o_orderpriority__max"),
    )
    # ...then unpivoted to one row per column (stack is a generator —
    # no extra pass, no shuffle).
    cols = ("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    stack_expr = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__min, {c}__max" for c in cols
    )
    return agg.selectExpr(
        f"stack({len(cols)}, {stack_expr}) AS (col_name, n_nonnull, n_distinct, min_val, max_val)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val")


@query(
    "etl_snapshot_diff",
    """
    WITH old AS (
        -- floor(x*100+0.5)/100 on BOTH sides: engine round() half-ulp
        -- semantics differ and *1.05 manufactures boundary cases
        SELECT o_orderkey, floor(o_totalprice * 100 + 0.5) / 100 AS val
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ), new AS (
        SELECT o_orderkey,
               floor(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice * 1.05
                          ELSE o_totalprice END * 100 + 0.5) / 100 AS val
        FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    )
    SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           old.val AS old_val, new.val AS new_val
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
       OR old.val <> new.val
    """,
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — derive a change log (added/removed/changed) from
    two table versions, the INVERSE of `etl_cdc_apply` (which folds a
    log into state). One full-outer join on the key, then a row-level
    comparison; unchanged rows are dropped so the output is
    change-sized, not table-sized. At 100 TB this is how you bootstrap
    CDC for a source that only offers periodic full dumps: diff
    consecutive snapshots (both sides co-partition on the key — one
    shuffle each) and feed the result to the same downstream as a real
    CDC feed. The 'changed' comparison on round(..., 2) values is
    engine-exact (same doubles, same rounding)."""
    o = table(spark, sf_dir, "orders")
    old = o.filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("old_key"),
        (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)) / 100).alias("old_val"),
    )
    new = o.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("new_key"),
        (
            F.floor(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT",
                    F.col("o_totalprice") * 1.05,
                ).otherwise(F.col("o_totalprice"))
                * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("new_val"),
    )
    joined = old.join(new, old.old_key == new.new_key, "full_outer")
    return (
        joined.filter(
            F.col("old_key").isNull()
            | F.col("new_key").isNull()
            | (F.col("old_val") != F.col("new_val"))
        )
        .select(
            F.coalesce("old_key", "new_key").alias("o_orderkey"),
            F.when(F.col("old_key").isNull(), "added")
            .when(F.col("new_key").isNull(), "removed")
            .otherwise("changed")
            .alias("change_type"),
            "old_val",
            "new_val",
        )
    )


@query(
    "etl_incremental_agg",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*), 6) AS avg_price,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4)
               AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def etl_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of an aggregate table: the standing
    state holds per-key mergeable partials (count, decimal sum) over the
    already-ingested orders (o_orderkey % 5 != 0); a new batch
    (% 5 == 0) is aggregated to the same partial shape and UNION-merged
    — final metrics derive from the merged partials. The oracle is the
    full recompute over everything, proving merge-equals-recompute:
    count and decimal-sum are commutative monoids, so maintaining the
    MB-scale state table costs one batch-sized aggregate per ingest
    instead of re-scanning the (100 TB) fact history. Averages and other
    non-mergeable metrics are DERIVED from the partials at read time —
    never stored — which is the entire trick."""
    o = table(spark, sf_dir, "orders")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s"),
        )

    state = partials(o.filter(F.col("o_orderkey") % 5 != 0))
    batch = partials(o.filter(F.col("o_orderkey") % 5 == 0))
    merged = state.unionByName(batch).groupBy("o_orderpriority").agg(
        F.sum("c").alias("c"), F.sum("s").alias("s")
    )
    return merged.select(
        "o_orderpriority",
        F.col("c").alias("n_orders"),
        F.round(F.col("s").cast("double") / F.col("c"), 6).alias("avg_price"),
        F.round(F.col("s").cast("double"), 4).alias("total_price"),
    )


@query(
    "etl_partition_overwrite",
    """
    WITH post AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders WHERE o_orderpriority <> '1-URGENT'
        UNION ALL
        SELECT o_orderkey, o_orderpriority,
               CAST(CAST(o_totalprice AS DECIMAL(18,2))
                    + CAST(25.00 AS DECIMAL(4,2)) AS DOUBLE)
        FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total
    FROM post GROUP BY o_orderpriority
    """,
)
def etl_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the idempotent-backfill primitive:
    rewriting one hive partition replaces ONLY the files under that
    partition directory, leaving siblings untouched (mode('overwrite')
    with partitionOverwriteMode=dynamic; static mode would truncate the
    whole table). Here: stage orders partitioned by priority, then
    re-publish the 1-URGENT partition from a filtered+repriced batch;
    the read-back aggregate proves the other four partitions survived.
    At 100 TB this is how daily re-runs stay O(changed partition), not
    O(table) — the poor man's transactional MERGE when no ACID table
    format is available (see SCALE.md on rewrite amplification)."""
    import os

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    dst = f"{_STAGE_ROOT}/{tag}_orders_dynpart"
    (
        o.write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(dst)
    )
    batch = (
        o.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 150000)
        )
        # Adjust in DECIMAL with no scale reduction (a flat surcharge):
        # decimal+decimal at 2dp is exact in both engines, whereas any
        # rounding step (round(x*1.1, 2)) exposes engine rounding-mode
        # differences — HALF_UP vs truncation — one cent per row.
        .withColumn(
            "o_totalprice",
            (
                F.col("o_totalprice").cast("decimal(18,2)")
                + F.lit("25.00").cast("decimal(4,2)")
            ).cast("double"),
        )
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            batch.write.mode("overwrite")
            .partitionBy("o_orderpriority")
            .parquet(dst)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = spark.read.parquet(dst)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total"),
    )


@query(
    "etl_compact_files",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total
    FROM events GROUP BY event_type
    """,
)
def etl_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the maintenance job every streaming/
    incremental pipeline needs: a sink that commits per micro-batch (or
    per task) leaves thousands of KB-sized files, and at 100 TB the
    NameNode/listing/task-scheduling overhead of small files dominates
    scan cost. This op fragments events into 64 splinter files, then
    compacts with a round-robin `repartition(4)` rewrite (repartition,
    not coalesce: coalesce(4) would merge map-side and skip the shuffle
    but chains upstream partitioning — fine for a pure rewrite, but
    repartition also rebalances skewed splinters; for a sorted layout
    use repartitionByRange, see parquet_clustered_sink). The exact
    read-back aggregate proves content integrity through both rewrites;
    file counts are asserted in tests (tests/test_operators.py::
    test_compact_files_counts — not here: in-op asserts vanish under
    ``python -O``, and round-robin partitions of a <64-row input
    legitimately emit fewer part files)."""
    import os

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    frag = f"{_STAGE_ROOT}/{tag}_events_fragmented"
    compact = f"{_STAGE_ROOT}/{tag}_events_compacted"
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    small = spark.read.parquet(frag)
    small.repartition(4).write.mode("overwrite").parquet(compact)
    back = spark.read.parquet(compact)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("n_users"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
        ).alias("total"),
    )
