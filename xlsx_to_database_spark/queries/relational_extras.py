"""Relational extras: pivot/unpivot reshaping, correlated subqueries,
and multi-join TPC-H-adapted flagship queries (SURVEY.md §2.12).

Scale notes:
- ``pivot`` with an **explicit value list** skips the extra
  distinct-collection job Spark otherwise runs to discover pivot columns
  — at 100 TB that discovery pass is a full-column scan you don't want.
  The pivot itself is a single hash aggregate (one shuffle on the group
  key), identical cost to the conditional-aggregation form.
- ``unpivot`` is a generator expression (no shuffle, no join): each row
  fans out to k rows inside the scan stage.
- EXISTS / IN / correlated-scalar subqueries decorrelate in Catalyst to
  semi/anti/left-outer joins — declarative subqueries cost the same as
  hand-written joins but keep intent obvious. The plan-quality tests
  assert the rewrite happens.
- The Q3/Q5-style flagships filter *before* joining (pushdown into the
  parquet scans), broadcast the bounded dims (region/nation), and
  sort-merge the fact-fact joins on the shuffle key; Q3's top-10 plans
  as TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xlsx_to_database_spark.catalog import register_views, table
from xlsx_to_database_spark.registry import query


@query(
    "pivot_wide",
    """
    SELECT l_linestatus,
           round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_a,
           round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_n,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_r
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide: quantity totals per linestatus, one column per return
    flag. Explicit pivot values ('A','N','R') avoid the distinct-scan
    Spark runs to discover them — the whole op is one hash aggregate."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_quantity"))
        .select(
            "l_linestatus",
            F.round(F.col("A"), 2).alias("qty_a"),
            F.round(F.col("N"), 2).alias("qty_n"),
            F.round(F.col("R"), 2).alias("qty_r"),
        )
    )


@query(
    "unpivot_long",
    """
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val
    FROM part
    """,
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long: each part row fans out to (attr, val) pairs. A pure
    generator — no shuffle; stays inside the scan stage at any scale."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    return p.unpivot("p_partkey", ["p_size", "p_retailprice"], "attr", "val")


_EXISTS_SQL = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
    )
"""


@query("subq_exists", _EXISTS_SQL)
def subq_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — customers with at least one big order.
    Catalyst decorrelates to a left-semi hash join; the inner filter
    pushes into the orders scan before the join."""
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


_IN_SQL = """
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity >= 45
    )
"""


@query("subq_in", _IN_SQL)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery — parts that ever shipped in bulk. Decorrelates to a
    semi join on p_partkey; no DISTINCT materialization of the inner
    side is ever needed."""
    register_views(spark, sf_dir)
    return spark.sql(_IN_SQL)


_SCALAR_SQL = """
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT MAX(s.s_acctbal) FROM supplier s
        WHERE s.s_nationkey = c.c_nationkey
    )
"""


@query("subq_scalar", _SCALAR_SQL)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — customers richer than every supplier
    in their nation. MAX (not AVG) keeps the comparison float-exact in
    both engines. Nations with no suppliers yield NULL > x → filtered,
    identically on both sides. Decorrelates to an aggregate + join."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SQL)


@query(
    "tpch_q3",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 adapted to the reduced schema (o_orderpriority stands in
    for o_shippriority): top-10 highest-revenue unshipped orders in the
    BUILDING segment. Both date filters push into the parquet scans, the
    fact-fact join sort-merges on orderkey, and the top-10 is
    TakeOrderedAndProject (per-partition heap + driver merge of 10·P
    rows — no global sort at any scale)."""
    cutoff = F.lit("1998-06-01").cast("timestamp")
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "tpch_q5",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): six-table join, revenue by
    nation for ASIA where customer and supplier share a nation. The
    bounded dims (region→nation) broadcast; the three fact tables
    sort-merge on their keys; the year filter pushes into the orders
    scan and prunes most of the fact input before any join."""
    c, o, li, s = (
        table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem", "supplier")
    )
    n, r = table(spark, sf_dir, "nation"), table(spark, sf_dir, "region")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    r = r.filter(F.col("r_name") == "ASIA")
    dims = F.broadcast(n.join(r, n.n_regionkey == r.r_regionkey))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(dims, s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


_LATERAL_SQL = """
    SELECT c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 2
    ) t
"""


@query("join_lateral", _LATERAL_SQL)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join — top-2 orders per customer, written the
    way an analyst writes it. Catalyst rewrites the per-row subquery
    into the same ranked-window join `topk_per_group` builds by hand:
    one shuffle on the correlation key, never per-row re-execution."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@query(
    "recursive_cte",
    """
    WITH RECURSIVE months(m) AS (
        -- DuckDB's date_trunc yields DATE at month precision; cast to
        -- TIMESTAMP so the spine matches Spark's timestamp column.
        SELECT CAST(min(date_trunc('month', o_orderdate)) AS TIMESTAMP) FROM orders
        UNION ALL
        SELECT m + INTERVAL '1 month' FROM months
        WHERE m < (SELECT CAST(max(date_trunc('month', o_orderdate)) AS TIMESTAMP)
                   FROM orders)
    )
    SELECT m AS month_start, count(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders
      ON CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) = m
    GROUP BY m
    """,
)
def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4) generating a calendar spine — every
    month from the first to the last order month, including months with
    zero orders (the gap-filling scaffold a naive GROUP BY can't see).
    Recursion depth = #months (bounded, driver-side plan growth only);
    the spine is tiny and broadcasts into the counting join."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT min(date_trunc('month', o_orderdate)) FROM orders
            UNION ALL
            SELECT m + INTERVAL '1' MONTH FROM months
            WHERE m < (SELECT max(date_trunc('month', o_orderdate)) FROM orders)
        )
        SELECT m AS month_start, count(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
        GROUP BY m
        """
    )


@query(
    "tpch_q7",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping) adapted to the synthetic nation names:
    bilateral trade volume between two nations by year. The nation dim
    is filtered to the two names *before* joining and broadcast twice
    (supplier side and customer side are separate equi-joins, not one
    OR-condition join — an OR in the join condition would force a
    nested-loop; the disjunction is applied as a cheap post-join filter
    on two broadcast-joined name columns). Fact tables sort-merge on
    their keys; the shipdate range pushes into the lineitem scan."""
    s, li, o, c = (
        table(spark, sf_dir, t) for t in ("supplier", "lineitem", "orders", "customer")
    )
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    li = li.filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, s.s_nationkey == F.col("sn_key"))
        .join(n2, c.c_nationkey == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "tpch_q17",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_size < 5
      AND l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue) with p_size standing in
    for the missing p_container. The correlated per-part average is
    computed as a grouped aggregate over *only the qualifying parts'*
    lineitems — the tiny part filter broadcasts into lineitem first, so
    the avg never touches the 99% of the fact table that can't qualify
    (the naive decorrelation aggregates ALL of lineitem, then joins; at
    100 TB that's the difference between scanning 40 GB and 100 TB for
    the subquery). Quantities are integer-valued, so the 0.2*avg
    threshold is float-exact and the boundary is deterministic."""
    p = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") < 5))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    mine = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresholds = mine.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        mine.join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "tpch_q18",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 300. The IN-subquery is itself a grouped aggregate over the
    fact table; its survivor set is tiny (dozens of orderkeys), so after
    the HAVING it broadcasts as a semi-join filter into the main
    customer⋈orders⋈lineitem pipeline — the big join only processes
    qualifying orders. Integer-valued quantities make the HAVING
    boundary exact; top-100 plans as TakeOrderedAndProject."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == F.col("big_orderkey"), "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


_Q21_SQL = """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders     ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL '90' DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL '90' DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""


@query("tpch_q21", _Q21_SQL)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) with lateness
    defined as shipping >90 days after the order date (the reduced
    schema has no commit/receipt dates). The gnarliest decorrelation
    case in the suite: one EXISTS (some other supplier on the order)
    and one NOT EXISTS (no OTHER supplier was late) — the anti-join's
    predicate references BOTH outer tables (l1 and orders). Catalyst
    rewrites the pair into a left-semi and a left-anti join on
    l_orderkey, each a single shuffle co-partitioned with the main
    join — no per-row re-execution at any scale."""
    register_views(spark, sf_dir)
    return spark.sql(_Q21_SQL)
