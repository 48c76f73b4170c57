"""Source/sink query ops (SURVEY.md §2.1).

Staging strategy: xlsx/csv/json inputs are generated *from the testdata
parquet* into /tmp caches, so every scan op has an exact DuckDB oracle
against the pre-registered views (read the staged file with Spark ⇔
read the original table with DuckDB). xlsx staging goes through our own
writer — which doubles as a round-trip test of the parser. The JDBC
sink round-trips through Spark's bundled Derby (a real database, real
batched inserts) and oracle-checks against the source view.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xlsx_to_database_spark.catalog import table
from xlsx_to_database_spark.registry import query
from xlsx_to_database_spark.sources import sinks as SK
from xlsx_to_database_spark.sources import xlsx_io
from xlsx_to_database_spark.sources.infer import sanitize_headers
from xlsx_to_database_spark.sources.xlsx import register_xlsx_source

_STAGE_ROOT = "/tmp/spark_stage"


def _tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _stage_xlsx_from_table(
    spark: SparkSession, sf_dir: str, name: str, split_col: str | None = None
) -> str:
    """Stage a (small) testdata table as an xlsx workbook — one sheet,
    or one sheet per distinct split_col value. xlsx is a small-data
    interchange format; staging collects, by design, only dimension-
    scale tables."""
    suffix = f"_{split_col}" if split_col else ""
    path = os.path.join(_STAGE_ROOT, f"{_tag(sf_dir)}_{name}{suffix}.xlsx")
    if os.path.exists(path):
        return path
    os.makedirs(_STAGE_ROOT, exist_ok=True)
    df = table(spark, sf_dir, name)
    header = df.columns
    if split_col:
        keys = sorted(r[0] for r in df.select(split_col).distinct().collect())
        sheets = {
            str(k): (header, [tuple(r) for r in df.filter(F.col(split_col) == k).collect()])
            for k in keys
        }
    else:
        sheets = {name: (header, [tuple(r) for r in df.collect()])}
    xlsx_io.write_workbook(path + ".tmp", sheets)
    os.replace(path + ".tmp", path)
    return path


@query(
    "xlsx_scan",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
           CAST(n_regionkey AS BIGINT) AS n_regionkey
    FROM nation
    """,
)
def xlsx_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read a worksheet through the xlsx Python Data Source: header row
    → names, shared strings decoded, numeric cells type-inferred (ints
    promote to BIGINT — hence the oracle casts)."""
    register_xlsx_source(spark)
    path = _stage_xlsx_from_table(spark, sf_dir, "nation")
    return spark.read.format("xlsx").load(path)


@query(
    "xlsx_infer",
    """
    SELECT * FROM (VALUES
      (true,  CAST(1 AS BIGINT), CAST(1.5 AS DOUBLE),   'alpha', '1',    TIMESTAMP '2024-03-01 10:30:00'),
      (false, CAST(2 AS BIGINT), CAST(-0.25 AS DOUBLE), 'beta',  'two',  TIMESTAMP '1899-06-15 00:00:00'),
      (NULL,  CAST(3 AS BIGINT), CAST(2.0 AS DOUBLE),   NULL,    'true', TIMESTAMP '1900-02-28 12:00:00')
    ) AS t(flag, n, x, note, mixed, at)
    """,
)
def xlsx_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-inference across the promotion lattice: bool, long,
    int+float→double, string, int+str→string (degraded), date serials →
    timestamp (incl. a pre-1900 and a leap-quirk-era date)."""
    register_xlsx_source(spark)
    path = os.path.join(_STAGE_ROOT, "infer_fixture.xlsx")
    if not os.path.exists(path):
        os.makedirs(_STAGE_ROOT, exist_ok=True)
        rows = [
            (True, 1, 1.5, "alpha", 1, datetime(2024, 3, 1, 10, 30, 0)),
            (False, 2, -0.25, "beta", "two", datetime(1899, 6, 15)),
            (None, 3, 2, None, True, datetime(1900, 2, 28, 12, 0, 0)),
        ]
        xlsx_io.write_workbook(
            path + ".tmp", {"data": (["flag", "n", "x", "note", "mixed", "at"], rows)}
        )
        os.replace(path + ".tmp", path)
    return spark.read.format("xlsx").load(path)


@query(
    "xlsx_multisheet",
    """
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
           CAST(c_nationkey AS BIGINT) AS c_nationkey,
           c_acctbal, c_mktsegment
    FROM customer
    """,
)
def xlsx_multisheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One workbook, one sheet per market segment (sheet='*'): each
    sheet decodes as its own InputPartition in parallel, and the union
    must reconstruct the whole customer table."""
    register_xlsx_source(spark)
    path = _stage_xlsx_from_table(spark, sf_dir, "customer", split_col="c_mktsegment")
    return spark.read.format("xlsx").option("sheet", "*").load(path)


@query(
    "ident_sanitize",
    """
    SELECT * FROM (VALUES
      ('Order ID',        'order_id'),
      ('  Total $ (net)', 'total_net'),
      ('2024 forecast',   'c_2024_forecast'),
      ('weird//name',     'weird_name'),
      ('DUP',             'dup'),
      ('dup',             'dup_2'),
      ('',                'col')
    ) AS t(raw_header, identifier)
    """,
)
def ident_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header → SQL identifier sanitization (lowercase, punctuation →
    _, digit prefix guard, collision dedup)."""
    raw = ["Order ID", "  Total $ (net)", "2024 forecast", "weird//name", "DUP", "dup", ""]
    return spark.createDataFrame(
        list(zip(raw, sanitize_headers(raw))), "raw_header string, identifier string"
    )


@query(
    "parquet_scan",
    """
    SELECT l_orderkey, l_partkey, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity < 10
    """,
)
def parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with projection + predicate pushdown (the explain
    plan shows PushedFilters on both predicates and a 4-column
    ReadSchema — asserted in tests/test_plans.py)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")


@query(
    "csv_scan",
    """
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
           CAST(c_nationkey AS BIGINT) AS c_nationkey,
           c_acctbal, c_mktsegment
    FROM customer
    """,
)
def csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delimited text with header + schema inference (staged from the
    customer table; numeric inference promotes to BIGINT/DOUBLE)."""
    out = os.path.join(_STAGE_ROOT, f"{_tag(sf_dir)}_customer_csv")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        table(spark, sf_dir, "customer").coalesce(1).write.mode("overwrite").option(
            "header", "true"
        ).csv(out)
    df = spark.read.csv(out, header=True, inferSchema=True)
    return df.select(
        F.col("c_custkey").cast("long"),
        "c_name",
        F.col("c_nationkey").cast("long"),
        F.col("c_acctbal").cast("double"),
        "c_mktsegment",
    )


@query(
    "json_scan",
    """
    SELECT event_id, event_type, value FROM events
    """,
)
def json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan (staged projection of events; timestamps are
    excluded — JSON round-trips them as strings, a format property,
    not an engine one)."""
    out = os.path.join(_STAGE_ROOT, f"{_tag(sf_dir)}_events_json")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        table(spark, sf_dir, "events").select("event_id", "event_type", "value").write.mode(
            "overwrite"
        ).json(out)
    return spark.read.json(out).select("event_id", "event_type", "value")


@query(
    "parquet_sink",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem WHERE l_quantity >= 45
    """,
)
def parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned columnar output (partitionBy l_returnflag → hive
    layout → partition pruning downstream), verified by reading back."""
    out = os.path.join(_STAGE_ROOT, f"{_tag(sf_dir)}_li_sink")
    src = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    SK.to_parquet(src, out, partition_by=["l_returnflag"])
    back = spark.read.parquet(out)
    return back.select(
        "l_orderkey", "l_linenumber", "l_quantity", F.col("l_returnflag").cast("string")
    )


@query(
    "jdbc_sink",
    """
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
           CAST(s_nationkey AS BIGINT) AS s_nationkey, s_acctbal
    FROM supplier
    """,
)
def jdbc_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's sink: CREATE TABLE + batched INSERTs over JDBC
    (Derby in-memory here; any JDBC URL in production), read back over
    JDBC and oracle-checked against the source. Executors write
    partition-parallel batched inserts; the driver never holds rows."""
    url = os.environ.get(
        "SPARK_GRAFT_JDBC_URL", f"jdbc:derby:memory:graft_{_tag(sf_dir)};create=true"
    )
    src = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long"),
        "s_name",
        F.col("s_nationkey").cast("long"),
        "s_acctbal",
    )
    SK.to_database(src, url, "supplier_sink", mode="truncate")
    back = SK.from_database(spark, url, "supplier_sink")
    return back.select(
        F.col("s_suppkey").cast("long"),
        "s_name",
        F.col("s_nationkey").cast("long"),
        F.col("s_acctbal").cast("double"),
    )


@query(
    "xlsx_sink",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
           CAST(n_regionkey AS BIGINT) AS n_regionkey
    FROM nation
    """,
)
def xlsx_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed xlsx write (DataSourceWriter: one part-*.xlsx per
    partition, _SUCCESS on commit) then read back — the full round trip
    through our own OOXML writer and reader, oracle-checked against the
    source table."""
    import glob

    register_xlsx_source(spark)
    out = os.path.join(_STAGE_ROOT, f"{_tag(sf_dir)}_nation_xlsx_sink")
    src = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long"),
        "n_name",
        F.col("n_regionkey").cast("long"),
    )
    src.write.format("xlsx").option("sheet", "nation").mode("overwrite").save(out)
    back = None
    for p in sorted(glob.glob(os.path.join(out, "part-*.xlsx"))):
        df = spark.read.format("xlsx").option("sheet", "nation").load(p)
        back = df if back is None else back.unionByName(df)
    return back


@query(
    "orc_sink",
    """
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name, p_brand,
           CAST(p_size AS BIGINT) AS p_size, p_retailprice
    FROM part
    """,
)
def orc_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round trip — Spark's other built-in columnar format, for
    pipelines standardized on Hive/ORC. Same distributed write shape as
    parquet (one file per task, _SUCCESS commit); predicate pushdown and
    column pruning work identically on read-back."""
    out = os.path.join(_STAGE_ROOT, f"{_tag(sf_dir)}_part_orc")
    src = table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long"),
        "p_name",
        "p_brand",
        F.col("p_size").cast("long"),
        F.col("p_retailprice").cast("double"),
    )
    src.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


@query(
    "csv_sink",
    """
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_quantity, l_returnflag
    FROM lineitem WHERE l_quantity >= 45
    """,
)
def csv_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round trip — header + per-task part files, read back with an
    explicit schema (no inference job at scale). Doubles survive the
    text round trip exactly (shortest-repr float formatting)."""
    out = os.path.join(_STAGE_ROOT, f"{_tag(sf_dir)}_li_csv")
    src = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45).select(
        F.col("l_orderkey").cast("long"),
        F.col("l_linenumber").cast("long"),
        F.col("l_quantity").cast("double"),
        "l_returnflag",
    )
    src.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema(
        "l_orderkey long, l_linenumber long, l_quantity double, l_returnflag string"
    ).option("header", True).csv(out)


@query(
    "text_scan",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, text FROM documents
    """,
)
def text_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text-lines ingestion (`spark.read.text` + declarative regex
    split) — the log-file path. Staged as tab-separated lines written
    distributed (one part per task); the parse is three codegen'd
    expressions, no UDF, so it pushes through whole-stage codegen at any
    scale."""
    out = os.path.join(_STAGE_ROOT, f"{_tag(sf_dir)}_docs_txt")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        docs = table(spark, sf_dir, "documents")
        docs.select(
            F.concat_ws("\t", F.col("doc_id"), F.col("lang"), F.col("text")).alias("value")
        ).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    parts = F.split(F.col("value"), "\t", 3)
    return lines.select(
        parts.getItem(0).cast("long").alias("doc_id"),
        parts.getItem(1).alias("lang"),
        parts.getItem(2).alias("text"),
    )


@query(
    "csv_quoted_scan",
    """
    SELECT doc_id,
           'prefix,"quoted" ' || chr(10) || source AS tricky,
           source
    FROM documents
    """,
)
def csv_quoted_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV quoting torture round-trip: values carrying embedded commas,
    double quotes, and NEWLINES are written with standard RFC-4180
    quoting and read back with `multiLine` — the option that makes the
    reader treat quoted newlines as data. (multiLine costs splittability:
    each file parses as a unit, so at scale you keep many moderate files
    rather than one giant one.) The oracle rebuilds the same tricky
    values directly from the source table — the scan must reproduce them
    byte-for-byte through the quote/escape/newline round trip."""
    out = os.path.join(_STAGE_ROOT, f"{_tag(sf_dir)}_docs_tricky_csv")
    tricky = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit('prefix,"quoted" '), F.lit("\n"), F.col("source")
        ).alias("tricky"),
        "source",
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        tricky.coalesce(1).write.mode("overwrite").option("header", "true").csv(out)
    return spark.read.csv(out, header=True, multiLine=True).select(
        F.col("doc_id").cast("long"),
        "tricky",
        "source",
    )


@query(
    "obs_metrics",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS total_price,
           CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted
    FROM lineitem
    """,
)
def obs_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`df.observe`: pipeline metrics collected DURING a query instead
    of by a second scan — on a 100 TB job, the difference between free
    monitoring and doubling the bill. The observation accumulates
    per-task and merges on the driver exactly like any aggregate; the
    oracle is the same aggregate as a standalone query, proving the
    observed numbers equal the recomputed ones."""
    from pyspark.sql import Observation

    li = table(spark, sf_dir, "lineitem")
    obs = Observation("lineitem_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2).alias(
            "total_price"
        ),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).cast("long").alias(
            "n_discounted"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()  # one real pass
    row = obs.get
    # Sum stays DECIMAL inside the observation (order-independent), but
    # the RESULT column is double on BOTH engines: a one-sided float
    # conversion hash-mismatched at sf0.1 ('…123.60' vs '…123.6'), and
    # round 9 proved the inverse too — DECIMAL result columns sit
    # outside the driver comparator's canonical domain. A 2dp decimal
    # casts to the identical IEEE double everywhere.
    return spark.createDataFrame(
        [(row["n_rows"], float(row["total_price"]), row["n_discounted"])],
        "n_rows long, total_price double, n_discounted long",
    )


@query(
    "parquet_pruned_read",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
           CAST(year(o_orderdate) AS INT) AS o_year
    FROM orders
    WHERE year(o_orderdate) = 1997
    """,
)
def parquet_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition pruning end-to-end: orders written hive-partitioned by
    order year, then read back with a partition-column filter. The
    filter never touches row data — it prunes DIRECTORIES at planning
    time (`PartitionFilters` in the scan, plan-asserted in
    tests/test_plans.py), so a 100 TB table filtered to one year costs
    one year's IO. This is the static sibling of the DPP plan test
    (which proves the same pruning driven by a join at runtime)."""
    out = os.path.join(_STAGE_ROOT, f"{_tag(sf_dir)}_orders_by_year")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        src = table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        SK.to_parquet(src, out, partition_by=["o_year"])
    back = spark.read.parquet(out).filter(F.col("o_year") == 1997)
    return back.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.col("o_year").cast("int").alias("o_year"),
    )


@query(
    "parquet_schema_merge",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE year(o_orderdate) = 1995
    UNION ALL
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderpriority
    FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def parquet_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: batch 1 lands without the priority
    column, batch 2 adds it; `mergeSchema` unifies the footers at read
    time and null-pads the old files — the additive-column pattern every
    long-lived ingest dataset hits. Schema merge is a FOOTER-level
    operation (per-file metadata union, no data rewrite), so evolving a
    100 TB dataset costs nothing until rows are actually read; the
    alternative — rewriting history to the new schema — is the rewrite
    amplification SCALE.md warns about for MERGE."""
    out = os.path.join(_STAGE_ROOT, f"{_tag(sf_dir)}_orders_evolved")
    o = table(spark, sf_dir, "orders")
    b1 = os.path.join(out, "batch=1")
    b2 = os.path.join(out, "batch=2")
    if not os.path.exists(os.path.join(b2, "_SUCCESS")):
        o.filter(F.year("o_orderdate") == 1995).select(
            "o_orderkey", "o_totalprice"
        ).write.mode("overwrite").parquet(b1)
        o.filter(F.year("o_orderdate") == 1996).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        ).write.mode("overwrite").parquet(b2)
    back = spark.read.option("mergeSchema", "true").parquet(b1, b2)
    return back.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderpriority",
    )


def _stage_binary_from_nation(spark: SparkSession, sf_dir: str) -> str:
    """Stage one small binary file per nation row (dimension-scale by
    design, like the xlsx fixtures): nation_<key>.bin containing
    'name|regionkey' UTF-8 bytes."""
    out = os.path.join(_STAGE_ROOT, f"{_tag(sf_dir)}_nation_bin")
    if os.path.isdir(out) and os.listdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    rows = table(spark, sf_dir, "nation").collect()
    for r in rows:
        payload = f"{r['n_name']}|{r['n_regionkey']}".encode("utf-8")
        tmp = os.path.join(out, f".nation_{r['n_nationkey']}.tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out, f"nation_{r['n_nationkey']}.bin"))
    return out


@query(
    "binary_scan",
    """
    SELECT 'nation_' || n_nationkey || '.bin' AS fname,
           CAST(strlen(n_name || '|' || n_regionkey) AS BIGINT) AS n_bytes,
           n_name || '|' || n_regionkey AS payload
    FROM nation
    """,
)
def binary_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary ingestion via Spark's built-in `binaryFile` source —
    the front door for image/audio/video corpora: each file becomes one
    row of (path, modificationTime, length, content BINARY) with NO
    decode on read, so bytes flow to downstream mapInPandas decoders
    (see media_* ops) without a Python round trip at scan time. Files
    here are staged from the region table so the oracle can re-derive
    every fact relationally; payload decodes back for the value check.
    At 100 TB the source lists files in parallel and assigns whole files
    to partitions — pair it with `spark.sql.files.maxPartitionBytes`
    sizing and consolidated object-store listings; tiny-file corpora
    should be compacted into parquet BINARY columns first (the
    multimodal_cols layout) to avoid per-file open overhead."""
    path = _stage_binary_from_nation(spark, sf_dir)
    df = spark.read.format("binaryFile").load(path)
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("fname"),
        F.col("length").alias("n_bytes"),
        F.col("content").cast("string").alias("payload"),
    )
