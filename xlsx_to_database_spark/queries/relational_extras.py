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
    WITH RECURSIVE bounds AS (
        -- DuckDB's date_trunc yields DATE at month precision; cast to
        -- TIMESTAMP so the spine matches Spark's timestamp column.
        SELECT CAST(min(date_trunc('month', o_orderdate)) AS TIMESTAMP) AS lo,
               CAST(max(date_trunc('month', o_orderdate)) AS TIMESTAMP) AS hi
        FROM orders
    ), months(m, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT m + INTERVAL '1 month', hi FROM months WHERE m < hi
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
    the spine is tiny and broadcasts into the counting join.

    The stop bound rides THROUGH the recursion as a column: a scalar
    subquery in the recursive step's WHERE is re-executed every
    iteration (one full orders aggregate per month — measured 11.7s vs
    0.5s at sf0.01, 22×). Hoist once into the anchor, carry it along."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
            SELECT min(date_trunc('month', o_orderdate)) AS lo,
                   max(date_trunc('month', o_orderdate)) AS hi
            FROM orders
        ), months(m, hi) AS (
            SELECT lo, hi FROM bounds
            UNION ALL
            SELECT m + INTERVAL '1' MONTH, hi FROM months WHERE m < hi
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
    fact table; its survivor set is tiny (qty sums > 300 are a ~1e-6
    fraction of orders at any SF).

    r13 optimization: the outer query's sum(l_quantity) per qualified
    order IS the HAVING aggregate — lineitem joins only on l_orderkey
    and the 5 group-by columns are functionally determined by
    o_orderkey, so re-scanning lineitem and re-aggregating the joined
    rows recomputes a number the subquery already produced. The
    survivor aggregate now CARRIES its sum: one lineitem scan, one
    exchange (the per-orderkey partial/final aggregate), the tiny
    survivor set broadcast into orders⋈customer, total_qty projected
    from the carried sum, top-100 as TakeOrderedAndProject. The r12
    plan paid a second full lineitem scan + a 5-column group-by
    exchange for the same answer (plans/r13/tpch_q18_before.txt nodes
    1–2 and 22–24). Neither fact table ever shuffles; quantities are
    integer-valued doubles so the carried sum is bit-equal to the
    oracle's re-aggregation regardless of summation order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("sq"), 2).alias("total_qty"),
        )
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


@query(
    "tpch_q6",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the pure-pushdown query — a
    single scan where every predicate reaches the parquet reader
    (PushedFilters on shipdate/discount/quantity) and the aggregate is
    one partial+final sum of a two-column projection. The plan to check
    that scan pruning works: no join, no window, nothing to hide
    behind."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q4",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL '30' DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking), lateness adapted to the
    reduced schema: an order counts when some line shipped >30 days
    after the order date (no commit/receipt dates exist). The EXISTS
    decorrelates to a left-semi join on orderkey whose condition also
    references the outer o_orderdate — one shuffle, quarter filter
    pushed into the orders scan."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


@query(
    "tpch_q8",
    """
    SELECT o_year,
           round(sum(CASE WHEN n2 = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               sn.n_name AS n2
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = cn.n_regionkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        WHERE r_name = 'AMERICA'
          AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of PROMO-part
    revenue among AMERICA-region customers, by order year. Eight-table
    star: both nation aliases and region broadcast (bounded dims);
    part's type filter pushes into its scan and semi-filters lineitem
    through the join; the two fact-fact joins (lineitem⋈orders⋈customer)
    sort-merge on their keys. The share is a conditional-sum/sum over
    one aggregate — no second pass."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("cn_key")
        )
    )
    sn = F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("n2")))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(cn, F.col("cn_key") == F.col("c_nationkey"))
        .join(sn, F.col("sn_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            F.col("n2"),
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("n2") == "NATION_3", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


@query(
    "tpch_q10",
    """
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name, c_mktsegment
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in a quarter. Return-flag and quarter filters push
    into the fact scans; nation broadcasts; top-20 plans as
    TakeOrderedAndProject over the grouped aggregate. Revenue sums in
    DECIMAL(18,6): double summation order differs across engines and at
    this aggregate's magnitude the divergence reaches the 2dp rounding
    boundary — decimal addition is associative, so both engines get the
    bit-identical total."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"), "n_name", "c_mktsegment",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "tpch_q13",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution), the filtered-LEFT-
    JOIN-inside-an-aggregate shape: customers keep their row even with
    zero qualifying orders (count(o_orderkey) ignores the null-extended
    side). Two hash aggregates; the second groups on the first's tiny
    output. The non-urgent filter lives in the JOIN CONDITION — putting
    it in WHERE would silently turn the left join inner."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@query(
    "tpch_q14",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO parts' share of one month's
    revenue. Month filter pushes into the lineitem scan; part joins on
    partkey (AQE broadcasts at small SF, shuffles at scale); the percent
    is a conditional-sum/sum in a single global aggregate."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", volume).otherwise(0.0))
                / F.sum(volume),
                6,
            ).alias("promo_pct")
        )
    )


@query(
    "tpch_q19",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size <= 15
           AND l_quantity >= 1  AND l_quantity <= 11)
       OR (p_brand = 'Brand#13' AND p_size <= 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#23' AND p_size <= 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three
    brand/size/quantity triples OR-ed together — the case that defeats
    naive predicate pushdown. Catalyst extracts the common sub-predicates
    it can (brand ∈ {...}, size ≤ 35, quantity bounds) below the join
    and evaluates the residual disjunction post-join; the join itself
    stays a plain partkey equi-join rather than degenerating to a
    cartesian with a filter."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    joined = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 25) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 35) & (q >= 20) & (q <= 30))
    )
    return joined.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@query(
    "tpch_q22",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1996-01-01'
                      AND o_orderdate <  TIMESTAMP '1996-07-01')
    GROUP BY c_mktsegment
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), segment-keyed in the
    reduced schema (no phone country codes): well-funded customers with
    no orders in 1996H1 (the synthetic data gives every customer a long
    order history, so lifetime never-ordered is empty — the windowed
    variant keeps the anti-join meaningful). The scalar subquery
    (positive-balance average) is one aggregate row broadcast into the
    filter; the NOT EXISTS decorrelates to a left-anti join on custkey
    against orders' filtered key projection."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
