"""Window function operators (SURVEY.md §2.5).

Every window here has a TOTAL ordering (key columns appended to the
orderBy) so ranks/frames are deterministic and hash-match the oracle —
the one discipline window parity lives or dies by.

Scale: a window shuffles once on its partition key and sorts within
partitions; none of these materialize a whole partition on the driver.
Skewed partition keys (a user with millions of events) are the risk at
100 TB — AQE skew handling covers joins, while windows want a bounded
key domain (user_id, custkey) which these all have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xlsx_to_database_spark.catalog import table
from xlsx_to_database_spark.registry import query


@query(
    "win_row_number",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three biggest orders per customer."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_rank_dense",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS price_rank,
           dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS price_dense_rank
    FROM orders
    WHERE o_totalprice > 400000
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank — ties share a rank, so no tiebreak column is
    needed for determinism (unlike row_number)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@query(
    "win_ntile",
    """
    SELECT c_custkey, c_acctbal,
           ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS bal_quartile
    FROM customer
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles by account balance; custkey tiebreak pins bucket edges.

    A naive global ``ntile`` is a single-partition WindowExec — the one
    window shape that cannot scale. This computes the identical result
    with the two-phase distributed global order (range-bucket on
    approx-quantile boundaries + per-bucket offsets, see
    operators/global_order.py): the sort parallelizes across buckets
    and no task ever holds the full table."""
    from xlsx_to_database_spark.operators.global_order import with_global_ntile

    c = table(spark, sf_dir, "customer")
    return with_global_ntile(
        c,
        [F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
        "c_acctbal",
        4,
        out="bal_quartile",
    ).select("c_custkey", "c_acctbal", "bal_quartile")


@query(
    "win_percent_cume",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS bal_pct_rank,
           round(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS bal_cume
    FROM customer
    """,
)
def win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist are rank-based, hence tie-stable."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume"),
    )


@query(
    "win_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_day,
           CAST(lag(o_orderdate) OVER w AS DATE) AS prev_day,
           CAST(lead(o_orderdate) OVER w AS DATE) AS next_day,
           date_diff('day',
                     CAST(lag(o_orderdate) OVER w AS DATE),
                     CAST(o_orderdate AS DATE)) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next order date per customer + day gap. Spark's
    datediff(end, start) == DuckDB date_diff('day', start, end) — note
    the flipped argument order."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    day = F.col("o_orderdate").cast("date")
    prev_day = F.lag(F.col("o_orderdate")).over(w).cast("date")
    return o.select(
        "o_custkey",
        "o_orderkey",
        day.alias("order_day"),
        prev_day.alias("prev_day"),
        F.lead(F.col("o_orderdate")).over(w).cast("date").alias("next_day"),
        F.datediff(day, prev_day).alias("days_since_prev"),
    )


@query(
    "win_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate ASC, o_orderkey ASC
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer in order-date order. The total
    ordering also fixes the float accumulation order, so 2dp rounding is
    engine-stable."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend")
    )


@query(
    "win_moving_avg",
    """
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS value_ma7
    FROM events
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average of event value per user."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id", F.round(F.avg("value").over(w), 4).alias("value_ma7")
    )


@query(
    "win_range_frame",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           count(*) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice
                          RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS peers_within_5k
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame on a numeric ordering: how many same-priority
    orders are priced within 5000 below this one. Range frames are
    value-based → tie-stable by construction."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-5000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("peers_within_5k"),
    )


@query(
    "win_first_last",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER w AS latest_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last order key per customer over the full-partition frame
    (default frames differ between engines for last_value — always
    spell the frame out)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("latest_order"),
    )


@query(
    "win_time_range",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL '7 days' PRECEDING AND CURRENT ROW), 2)
             AS trailing_7d
    FROM orders
    """,
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: trailing-7-day spend per customer at
    every order. Unlike a ROWS frame, the frame is defined by the
    *timestamp value* — peers with equal order dates enter the frame
    together, which also makes the sum deterministic under ties (no
    tie-break column needed; a ROWS frame would need one). One shuffle
    on custkey, sort within partitions, single forward pass."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_wtr")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_orderdate,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 2)
                 AS trailing_7d
        FROM __orders_wtr
        """
    )


@query(
    "win_sessionize",
    """
    SELECT user_id, event_id, ts,
           CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
    FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    )
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): number each user's
    sessions with a 30-minute inactivity gap — `lag` flags session
    starts, a running sum turns flags into session ids. The batch twin
    of `stream_session`: same semantics, two window passes over ONE
    shuffle+sort on user_id (Catalyst reuses the sort for both windows
    since partition+order match). The gap compares microsecond epochs —
    a seconds cast would truncate and could sessionize a fractionally
    >30min gap differently from the oracle's exact interval compare."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0).alias("is_new"),
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return flagged.select(
        "user_id", "event_id", "ts", F.sum("is_new").over(run).alias("session_id")
    )


@query(
    "win_fill_forward",
    """
    SELECT user_id, event_id, ts, k_val,
           last_value(k_val IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k_filled
    FROM (
        SELECT user_id, event_id, ts,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events
    )
    """,
)
def win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF — last observation carried forward): propagate
    each user's most recent non-null reading over gaps, the timeseries
    repair step before any resampling. `last(ignoreNulls)` over a
    running frame — one shuffle on user_id, single forward pass, no
    self-join and no driver loop. Rows before a user's first reading
    stay NULL (identically in both engines)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "k_val",
        F.last("k_val", ignorenulls=True).over(w).alias("k_filled"),
    )


@query(
    "win_nth_value",
    """
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 3) OVER w AS third_order,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full partition frame: each order row sees the
    customer's third-ever order (null for customers with fewer than 3).
    The frame is spelled out — engines disagree on nth_value's default
    frame the same way they do for last_value."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 3).over(w).alias("third_order"),
        F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).cast("long").alias("n_orders"),
    )


@query(
    "win_running_distinct",
    """
    WITH marked AS (
        -- first occurrence per (user, type) WITHOUT partitioning on the
        -- type: order the user's rows by (type, ts, id) and flag block
        -- starts with lag() - keeps every window on the user_id
        -- partitioning so the whole op needs ONE shuffle
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(event_type) OVER (
                        PARTITION BY user_id
                        ORDER BY event_type, ts, event_id)
                    IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS first_seen
        FROM events
    )
    SELECT user_id, ts, event_id,
           CAST(sum(first_seen) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS distinct_types_so_far
    FROM marked
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — which Spark (and ANSI
    SQL) reject directly. The decomposition: flag each value's FIRST
    occurrence per (user, value) via a lag() block-start flag over
    (value, ts) ordering, then a running sum of flags over the user's
    timeline. The flag window deliberately partitions on user_id ALONE
    (ordering by type inside) rather than (user_id, type): both windows
    then share one partitioning and the whole op is a single Exchange
    with two Sorts (plan-asserted) — a (user, type)-partitioned
    row_number would force a second shuffle. State is
    O(1) per row vs the naive collect_set-and-size approach, whose
    per-row set materialization is O(distinct) memory and no codegen.
    Total tie-break (ts, event_id) keeps both engines' orderings
    identical."""
    ev = table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_type = F.lag("event_type").over(w_first)
    return (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                prev_type.isNull() | (prev_type != F.col("event_type")), 1
            ).otherwise(0).alias("first_seen"),
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.sum("first_seen").over(w_run).cast("long").alias(
                "distinct_types_so_far"
            ),
        )
    )


@query(
    "win_global_rank",
    """
    SELECT o_orderkey, o_totalprice,
           CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) AS price_rank
    FROM orders
    """,
)
def win_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact GLOBAL rank over the full fact table — the operation that,
    written naively (``row_number() OVER (ORDER BY ...)`` with no
    partition), funnels every row through one task. Implemented with the
    two-phase distributed global order (operators/global_order.py):
    approx-quantile range buckets over the driving key, per-bucket
    row_number, exclusive bucket-prefix offsets broadcast back. Exactly
    the single-partition answer, but the sort runs bucket-parallel and
    peak per-task memory is ~1/B of the input — this survives 100 TB
    where the naive plan OOMs one executor. DESC order is handled by
    ranking on the negated driving key (boundaries stay ascending)."""
    from xlsx_to_database_spark.operators.global_order import (
        with_global_row_number,
    )

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    neg = o.withColumn("__neg", -F.col("o_totalprice"))
    return (
        with_global_row_number(
            neg,
            [F.col("__neg").asc(), F.col("o_orderkey").asc()],
            "__neg",
            out="price_rank",
        )
        .drop("__neg")
        .select("o_orderkey", "o_totalprice", "price_rank")
    )


@query(
    "win_rolling_median",
    """
    SELECT user_id, event_id,
           round(quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS value_med7
    FROM events
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median over the trailing 7 events per user — the
    robust sibling of win_moving_avg (medians shrug off the spikes that
    wreck a mean-based alert). Spark has no windowed percentile, so the
    frame is materialized with collect_list over the same 7-row frame,
    sorted, and interpolated with quantile_cont semantics (pos =
    (n-1)/2, linear between the two bracketing order statistics — the
    identical arithmetic DuckDB runs). Frame state is O(7) per row, the
    window is one shuffle+sort on user_id shared with any other window
    on that key; a 10k-row frame would want a different algorithm
    (two-heap sketch in applyInPandas), 7 rows want exactly this."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-6, Window.currentRow)
    )
    a = F.array_sort(F.collect_list("value").over(w))
    n = F.size(a)
    pos = (n - 1).cast("double") / 2
    lo = F.element_at(a, F.floor(pos).cast("int") + 1)
    hi = F.element_at(a, F.ceil(pos).cast("int") + 1)
    med = lo + (hi - lo) * (pos - F.floor(pos))
    return ev.select(
        "user_id", "event_id", F.round(med, 4).alias("value_med7")
    )
