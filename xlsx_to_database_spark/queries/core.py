"""Projection / filter / predicate ops (SURVEY.md §2.2) + the flagship.

All pure Catalyst: built-in column expressions only, so filters and
projections push down into the parquet scan (verify with
``df.explain('formatted')`` → PushedFilters / ReadSchema) and stay inside
whole-stage codegen. Nothing here shuffles except the grouped flagship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xlsx_to_database_spark.catalog import table
from xlsx_to_database_spark.registry import query

# ---------------------------------------------------------------------------
# Flagship (M0): revenue by return status — TPC-H Q1 adapted to the reduced
# schema (SURVEY.md §7 M0). Scan + filter + expr projection + group-agg +
# sort. At 100 TB: single shuffle on a 6-value grouping key with map-side
# partial aggregation — the canonical scalable aggregate.
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS cnt
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


query("agg_basic", FLAGSHIP_ORACLE)(flagship)


# ---------------------------------------------------------------------------
# §2.2 projection / filter / predicates
# ---------------------------------------------------------------------------


@query(
    "project_select",
    """
    SELECT o_orderkey,
           o_custkey AS customer_key,
           o_totalprice * 0.9 AS discounted,
           upper(o_orderstatus) AS status_uc
    FROM orders
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning + rename + computed columns — ReadSchema should list
    only the four source columns."""
    return table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("customer_key"),
        (F.col("o_totalprice") * 0.9).alias("discounted"),
        F.upper("o_orderstatus").alias("status_uc"),
    )


@query(
    "filter_pred",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_totalprice > 100000 AND o_orderstatus = 'F')
       OR o_orderpriority = '1-URGENT'
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive + disjunctive predicates; pushed to the parquet scan."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_totalprice") > 100000) & (F.col("o_orderstatus") == "F"))
        | (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "filter_between",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    """,
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_shipdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@query(
    "filter_in",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
    """,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "filter_like",
    """
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%BRASS%' OR regexp_matches(p_name, '.*blue.*')
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%BRASS%") | F.col("p_name").rlike(".*blue.*")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "null_handling",
    """
    SELECT c_custkey,
           c_acctbal IS NULL AS bal_is_null,
           coalesce(c_acctbal, 0.0) AS bal_or_zero,
           c_nationkey IS NOT DISTINCT FROM 3 AS is_nation3
    FROM customer
    WHERE c_acctbal IS NOT NULL
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isNull/coalesce/null-safe-eq. Testdata has no null acctbals, but the
    expressions still exercise null semantics end to end."""
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal").isNotNull()).select(
        "c_custkey",
        F.col("c_acctbal").isNull().alias("bal_is_null"),
        F.coalesce(F.col("c_acctbal"), F.lit(0.0)).alias("bal_or_zero"),
        F.col("c_nationkey").eqNullSafe(F.lit(3)).alias("is_nation3"),
    )


@query(
    "case_when",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           CASE o_orderstatus WHEN 'F' THEN 'finished' ELSE 'open-ish' END AS status_word
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("open-ish")
        .alias("status_word"),
    )


@query(
    "cast_types",
    """
    SELECT l_orderkey,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(l_linenumber AS DOUBLE) AS line_dbl,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(l_shipdate AS DATE) AS ship_day,
           CAST('1996-07-04' AS TIMESTAMP) AS fixed_ts
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit casts across the type lattice (§1.2) incl. str→ts, ts→date."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
        F.lit("1996-07-04").cast("timestamp").alias("fixed_ts"),
    )


@query(
    "distinct_rows",
    """
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level distinct — hash aggregate under the hood, map-side partial."""
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
