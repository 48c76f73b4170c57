"""Sort / limit / top-k / sampling (§2.6) and set operations (§2.7).

Scale notes: `orderBy(...).limit(n)` plans as TakeOrderedAndProject —
per-partition top-k then a single driver merge of n·P rows, never a full
global sort. Top-k-per-group uses a window rank, which shuffles once on
the group key. Set ops are unions (no shuffle) or hash-distinct
aggregates (one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xlsx_to_database_spark.catalog import table
from xlsx_to_database_spark.registry import query


@query(
    "sort_multi",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    ORDER BY c_mktsegment ASC, c_acctbal DESC NULLS LAST, c_custkey ASC
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort with explicit null placement."""
    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_mktsegment", "c_acctbal").orderBy(
        F.col("c_mktsegment").asc(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey").asc(),
    )


@query(
    "limit_n",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 with a total ordering (orderkey tiebreak) so both
    engines pick identical rows."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "topk_per_group",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment: window rank + filter. AQE handles
    the (bounded) group-key shuffle; the rank never materializes the full
    sorted group on the driver."""
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query("sample_frac")  # rows-only: sampling RNG streams differ across engines
def sample_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample — deterministic within Spark (fixed seed,
    stable partitioning), but no cross-engine oracle exists."""
    return table(spark, sf_dir, "lineitem").sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "set_union_all",
    """
    SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-01-01'
    UNION ALL
    SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union reuniting a date split — row-count additivity law holds
    (property-tested). Union is a no-shuffle plan node."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_shipdate")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    return li.filter(F.col("l_shipdate") < cutoff).unionByName(
        li.filter(F.col("l_shipdate") >= cutoff)
    )


@query(
    "set_union_distinct",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_cust.union(o_cust).distinct()


@query(
    "set_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with both a finished and an open order (set semantics)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .intersect(o.filter(F.col("o_orderstatus") == "O").select("o_custkey"))
    )


@query(
    "set_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: customer keys with no pending ('P') order."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return c.select("c_custkey").subtract(
        o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("c_custkey"))
    )


@query(
    "sample_hash",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1', '2')
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling — ~3/16 of rows selected by the
    first hex digit of md5(key). Unlike `sample_frac` (engine RNG ⇒
    rows-only check), hash selection is reproducible across engines,
    runs, partitionings, AND retries — the property that matters for
    training-set sampling at 100 TB: a re-run after a failure selects the
    SAME sample, so downstream dedup/splits stay consistent. Map-only,
    filter evaluated in the scan stage; the hash costs ~ns/row and
    never shuffles."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin(
            "0", "1", "2"
        )
    ).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
