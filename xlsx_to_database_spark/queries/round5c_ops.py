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
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
             CAST(l_extendedprice AS DECIMAL(18,2))
               - lag(CAST(l_extendedprice AS DECIMAL(18,2))) OVER w AS d,
             row_number() OVER w AS rn
      FROM lineitem
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber)
    ), g AS (
      SELECT l_suppkey, l_orderkey, l_linenumber, rn,
             sum(CASE WHEN d > 0 THEN d ELSE CAST(0 AS DECIMAL(18,2)) END)
               OVER f AS gain,
             sum(CASE WHEN d < 0 THEN -d ELSE CAST(0 AS DECIMAL(18,2)) END)
               OVER f AS loss
      FROM px
      WINDOW f AS (PARTITION BY l_suppkey
                   ORDER BY rn
                   ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(100.0 * CAST(gain AS DOUBLE)
                 / CAST(gain + loss AS DOUBLE), 6) AS rsi
    FROM g
    WHERE rn > {_RSI_N} AND gain + loss <> 0
    """,
)
def win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI-14 (Cutler's simple-average variant) per supplier over their
    shipped-line price series — the momentum oscillator beside `win_ohlc` /
    `win_rolling_vwap` / `win_drawdown` in the finance-window family.
    Delta = price − lag(price); RSI = 100·Σgain / (Σgain + Σloss) over
    the trailing 14 deltas, emitted only once the frame is full
    (rn > 14) and defined (some movement in the window).

    Exactness: prices and deltas are DECIMAL(18,2), so both windowed
    sums are exact integers-in-cents regardless of per-engine summation
    order; the one float step (the final ratio) is the identical
    expression over identical decimals on both sides.

    Scale shape: one shuffle on l_suppkey feeds BOTH windows (same
    partitioning, same sort — Catalyst reuses the exchange and the
    sort), and the frame is ROWS-bounded so state per row is O(14).
    No global sort anywhere: the series is per-key, exactly how a
    1000-executor cluster wants tick data partitioned."""
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    px = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        (p - F.lag(p).over(w)).alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    zero = F.lit(0).cast("decimal(18,2)")
    f = (
        Window.partitionBy("l_suppkey")
        .orderBy("rn")
        .rowsBetween(-(_RSI_N - 1), 0)
    )
    g = px.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "rn",
        F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(zero))
        .over(f).alias("gain"),
        F.sum(F.when(F.col("d") < 0, -F.col("d")).otherwise(zero))
        .over(f).alias("loss"),
    )
    return g.filter(
        (F.col("rn") > _RSI_N) & (F.col("gain") + F.col("loss") != 0)
    ).select(
        "l_suppkey", "l_orderkey", "l_linenumber",
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


@query(
    "etl_bitemporal",
    """
    WITH v0 AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             o_orderdate AS recorded_at
      FROM orders
    ), corr AS (
      SELECT k, status,
             CAST(price + 100 AS DECIMAL(18,2)) AS price,
             recorded_at + INTERVAL 10 DAY AS recorded_at
      FROM v0 WHERE k % 7 = 0
    ), versions AS (
      SELECT * FROM v0 UNION ALL SELECT * FROM corr
    ), axes AS (
      SELECT unnest(ARRAY[TIMESTAMP '1998-01-01', TIMESTAMP '2002-01-01'])
             AS as_of
    ), believed AS (
      SELECT a.as_of, v.k, v.status,
             max_by(v.price, v.recorded_at) AS price
      FROM versions v JOIN axes a ON v.recorded_at <= a.as_of
      GROUP BY a.as_of, v.k, v.status
    )
    SELECT as_of, status, CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(price) AS DOUBLE), 2) AS believed_total
    FROM believed GROUP BY as_of, status
    """,
)
def etl_bitemporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal reconstruction — "what did we BELIEVE on date T?" —
    the second time axis `etl_scd2` doesn't have: every order is
    recorded on its order date, every 7th gets a +100 price correction
    recorded 10 days later, and the query rebuilds the believed state
    per order at two transaction-time cutoffs (mid-history and post-history). An as-of on RECORD time
    (audit, restatement, ML training-set reproduction: "train only on
    what was known then") rather than on validity time.

    Shape: versions ⋈ as-of axis (a 2-row broadcast), then
    ``max_by(price, recorded_at)`` per (as_of, key) — latest-belief
    selection as a single mergeable aggregate, no window sort. One
    shuffle on (as_of, k); version fan-in per key is bounded (≤2 here,
    single digits in any real ledger), so partial aggregation collapses
    it map-side. Decimal prices keep both engines hash-identical."""
    o = table(spark, sf_dir, "orders")
    v0 = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.col("o_orderdate").alias("recorded_at"),
    )
    corr = v0.filter(F.col("k") % 7 == 0).select(
        "k", "status",
        (F.col("price") + 100).cast("decimal(18,2)").alias("price"),
        (F.col("recorded_at") + F.expr("INTERVAL 10 DAY")).alias("recorded_at"),
    )
    versions = v0.unionByName(corr)
    axes = spark.sql(
        "SELECT explode(array(TIMESTAMP '1998-01-01',"
        " TIMESTAMP '2002-01-01')) AS as_of"
    )
    believed = (
        versions.join(axes, F.col("recorded_at") <= F.col("as_of"))
        .groupBy("as_of", "k", "status")
        .agg(F.max_by("price", "recorded_at").alias("price"))
    )
    return believed.groupBy("as_of", "status").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("price").cast("double"), 2).alias("believed_total"),
    )


_FRESH_SLA_SEC = 1800  #: staleness SLA (30 min)


@query(
    "dq_freshness",
    f"""
    WITH per AS (
      SELECT event_type, max(ts) AS last_ts, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ), g AS (SELECT max(ts) AS gmax FROM events)
    SELECT event_type, last_ts, n,
           CAST((epoch_us(gmax) - epoch_us(last_ts)) // 1000000
                AS BIGINT) AS lag_sec,
           (epoch_us(gmax) - epoch_us(last_ts)) // 1000000
             > {_FRESH_SLA_SEC} AS stale
    FROM per CROSS JOIN g
    """,
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-freshness audit — per event type: latest event, row count,
    staleness lag behind the newest event anywhere, and an SLA breach
    flag (30 min). The first check every ingestion dashboard runs: a
    source whose max(ts) stopped advancing is silently dead long before
    volume alarms notice.

    Shape: one partial-aggregating pass for the per-type maxima, one
    single-row global aggregate broadcast back over them (Spark plans
    the 1×K cross join as BroadcastNestedLoopJoin — K rows, metadata
    cost). Lag is computed in integer epoch-microseconds on both
    engines; no timestamp-difference builtin is used because Spark's
    `timestampdiff` counts complete units while DuckDB's `date_diff`
    counts boundary crossings — the epoch arithmetic sidesteps that
    semantic trap exactly."""
    ev = table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n")
    )
    g = ev.agg(F.max("ts").alias("gmax"))
    lag = (
        (F.unix_micros(F.col("gmax")) - F.unix_micros(F.col("last_ts")))
        / F.lit(1000000)
    ).cast("long")
    return per.crossJoin(F.broadcast(g)).select(
        "event_type", "last_ts", "n",
        lag.alias("lag_sec"),
        (lag > _FRESH_SLA_SEC).alias("stale"),
    )


_PR_THRESHOLDS = (50000, 100000, 150000, 200000, 250000)


@query(
    "ml_pr_curve",
    f"""
    WITH t AS (
      SELECT unnest(ARRAY{list(_PR_THRESHOLDS)}) AS threshold
    ), c AS (
      SELECT t.threshold,
             CAST(count(*) FILTER (WHERE o_orderpriority IN
               ('1-URGENT', '2-HIGH') AND o_totalprice >= t.threshold)
               AS BIGINT) AS tp,
             CAST(count(*) FILTER (WHERE o_orderpriority NOT IN
               ('1-URGENT', '2-HIGH') AND o_totalprice >= t.threshold)
               AS BIGINT) AS fp,
             CAST(count(*) FILTER (WHERE o_orderpriority IN
               ('1-URGENT', '2-HIGH') AND o_totalprice < t.threshold)
               AS BIGINT) AS fn
      FROM orders CROSS JOIN t GROUP BY t.threshold
    )
    SELECT CAST(threshold AS BIGINT) AS threshold, tp, fp, fn,
           round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS precision,
           round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS recall
    FROM c
    """,
)
def ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall sweep over fixed score thresholds — the
    classifier-eval companion to `ml_roc_auc` (which integrates over ALL
    thresholds; this reports the operating points you'd actually pick).
    Score = order price, label = urgent/high priority.

    Shape: fan the fact table out over the literal threshold axis and
    conditionally count — per-partition aggregate state is |thresholds|
    rows, so map-side combine collapses the 5× explode before the
    shuffle ever sees it: one pass, one metadata-size exchange,
    no global score sort anywhere. That is the property that lets the
    same query run at 100 TB — a rank-based PR curve (sort by score,
    cumulative counts) would need a total order; the fixed-grid sweep
    needs none. Counts are exact integers; the two ratios are the
    identical double expression on both engines."""
    o = table(spark, sf_dir, "orders")
    t = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in _PR_THRESHOLDS]))
        .alias("threshold")
    )
    pos = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    hi = F.col("o_totalprice") >= F.col("threshold")
    c = (
        o.crossJoin(F.broadcast(t))
        .groupBy("threshold")
        .agg(
            F.count_if(pos & hi).alias("tp"),
            F.count_if(~pos & hi).alias("fp"),
            F.count_if(pos & ~hi).alias("fn"),
        )
    )
    return c.select(
        F.col("threshold").cast("long").alias("threshold"), "tp", "fp", "fn",
        F.round(
            F.col("tp").cast("double") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)),
            6,
        ).alias("precision"),
        F.round(
            F.col("tp").cast("double") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)),
            6,
        ).alias("recall"),
    )


_BOLL_N = 20  #: Bollinger window length


@query(
    "win_bollinger",
    f"""
    WITH px AS (
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
             row_number() OVER (PARTITION BY l_suppkey
                                ORDER BY l_shipdate, l_orderkey,
                                         l_linenumber) AS rn
      FROM lineitem
    ), s AS (
      SELECT l_suppkey, l_orderkey, l_linenumber, p, rn,
             sum(p) OVER f AS sp,
             sum(CAST(p * p AS DECIMAL(38,4))) OVER f AS spp
      FROM px
      WINDOW f AS (PARTITION BY l_suppkey ORDER BY rn
                   ROWS BETWEEN {_BOLL_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(CAST(sp AS DOUBLE) / {_BOLL_N}, 6) AS mid,
           round(CAST(sp AS DOUBLE) / {_BOLL_N}
                 + 2 * sqrt((CAST(spp AS DOUBLE)
                             - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)
                               / {_BOLL_N}) / {_BOLL_N - 1}), 6) AS upper,
           round(CAST(sp AS DOUBLE) / {_BOLL_N}
                 - 2 * sqrt((CAST(spp AS DOUBLE)
                             - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)
                               / {_BOLL_N}) / {_BOLL_N - 1}), 6) AS lower
    FROM s WHERE rn >= {_BOLL_N}
    """,
)
def win_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (20-row mean ± 2 sample-σ) per supplier
    shipped-line price series — the volatility envelope beside `win_rsi` in the finance
    family. Emitted only on full frames (rn ≥ 20).

    Exactness: the two windowed moments are DECIMAL sums (exact in any
    summation order); mean/σ/bands are ONE identical double expression
    over those decimals on both engines, so IEEE evaluation matches
    bit-for-bit and the 6dp round is cosmetic, not a tolerance.

    Scale shape: identical to win_rsi — one shuffle on l_suppkey, both
    moments from the same ROWS-bounded frame in one window pass, O(1)
    state per row. The textbook two-pass σ (mean first, then squared
    deviations) would double the window work; the sufficient-statistic
    form [Σp, Σp²] needs one."""
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    px = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
        F.row_number().over(w).alias("rn"),
    )
    f = (
        Window.partitionBy("l_suppkey")
        .orderBy("rn")
        .rowsBetween(-(_BOLL_N - 1), 0)
    )
    s = px.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "rn",
        F.sum("p").over(f).alias("sp"),
        F.sum((F.col("p") * F.col("p")).cast("decimal(38,4)"))
        .over(f).alias("spp"),
    )
    mean = F.col("sp").cast("double") / _BOLL_N
    sd = F.sqrt(
        (
            F.col("spp").cast("double")
            - F.col("sp").cast("double") * F.col("sp").cast("double") / _BOLL_N
        )
        / (_BOLL_N - 1)
    )
    return s.filter(F.col("rn") >= _BOLL_N).select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.round(mean, 6).alias("mid"),
        F.round(mean + 2 * sd, 6).alias("upper"),
        F.round(mean - 2 * sd, 6).alias("lower"),
    )


@query(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), c AS (
      SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
    )
    SELECT prev, next, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY prev), 6) AS p
    FROM c
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    — P(next event type | current) with empirical row-normalized
    probabilities. The session-model primitive behind next-action
    prediction, anomaly scoring ("this transition never happens"), and
    clickstream simulation; `text_markov_bigrams` is the same math on
    token streams, this is the behavioral-events instance keyed and
    ordered the way event data actually arrives.

    Shape: one shuffle on user_id for the lag window, then a partial
    (map-side combining) aggregate down to the |types|² transition grid
    — metadata scale regardless of corpus size; the final normalizing
    window runs over that grid, not the data. Total order (ts,
    event_id) makes the lag — and thus the hash — deterministic under
    timestamp ties."""
    seq = table(spark, sf_dir, "events").select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev"),
    )
    c = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return c.select(
        "prev", "next", "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("prev")),
            6,
        ).alias("p"),
    )


@query(
    "etl_late_arriving_dim",
    """
    WITH present AS (
      SELECT * FROM customer WHERE c_custkey % 13 <> 0
    ), phase1 AS (
      SELECT o.o_orderkey, o.o_custkey,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS price,
             p.c_nationkey AS nk1
      FROM orders o LEFT JOIN present p ON o.o_custkey = p.c_custkey
    )
    SELECT c.c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE ph.nk1 IS NULL) AS BIGINT)
             AS n_late_attributed,
           round(CAST(sum(ph.price) AS DOUBLE), 2) AS total
    FROM phase1 ph JOIN customer c ON ph.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
)
def etl_late_arriving_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension handling (Kimball's inferred-member
    pattern): facts load while every 13th customer's dimension row has
    not arrived yet — phase 1 attributes them to an UNKNOWN member
    instead of dropping or stalling the load; phase 2 re-attributes once
    the full dimension lands, reporting per nation how many orders
    transited through UNKNOWN. The alternative designs both fail at
    scale: dropping unmatched facts loses revenue silently, and stalling
    the load turns one late dim row into an SLA breach for the whole
    pipeline.

    Shape: two equi-joins against the dimension (AQE broadcasts it when
    small, shuffles otherwise) + one aggregate; the UNKNOWN transit flag
    is just the phase-1 join's null-ness carried forward — no second
    scan of the facts."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    present = c.filter(F.col("c_custkey") % 13 != 0)
    phase1 = o.join(
        present, o["o_custkey"] == present["c_custkey"], "left"
    ).select("o_orderkey", "o_custkey", "price",
             F.col("c_nationkey").alias("nk1"))
    return (
        phase1.join(c, phase1["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_if(F.col("nk1").isNull()).alias("n_late_attributed"),
            F.round(F.sum("price").cast("double"), 2).alias("total"),
        )
    )
