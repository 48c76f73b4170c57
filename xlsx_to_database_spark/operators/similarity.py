"""Embedding similarity search (SURVEY.md §2.10 sim_*).

Cosine similarity is computed with built-in higher-order array functions
(`zip_with` + `aggregate`) in float64 — JVM-side, whole-stage-codegen,
no Python in the row path. The brute-force paths here are the exact
baselines; `knn_join_blocked` shows the blocking pattern that scales:
restrict candidate pairs by a partition key (label, LSH bucket, IVF
cell) so the cross product is per-block, then rank within blocks.

At 100 TB the same structure holds with a learned/IVF blocking column:
candidates = join on block key (shuffle co-partitioned), score = array
math, select = per-query top-k window. No driver-side collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Float64 dot product of two array<float> columns (sequential
    left-to-right accumulation — deterministic and engine-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a: Column, b: Column, decimals: int = 6) -> Column:
    """Cosine similarity rounded to `decimals` (rounding makes the value
    stable across engines/accumulation orders for oracle checks)."""
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), decimals)


def cosine_topk(
    embeddings: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k cosine neighbors of a single query vector.

    `query_vec` is a 1-row DataFrame with column `qvec`; it is broadcast
    so the scan side never shuffles — the global top-k is a
    TakeOrderedAndProject (per-partition heaps, driver merges k·P rows).
    """
    scored = embeddings.crossJoin(F.broadcast(query_vec)).select(
        F.col(id_col),
        cosine_sim(F.col(vec_col), F.col("qvec")).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def knn_join_blocked(
    embeddings: DataFrame,
    k: int = 3,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k nearest neighbors per vector among vectors sharing `block_col`.

    The equi-join on the block key keeps this a shuffle-co-partitioned
    join (quadratic only within blocks); a per-query row_number window
    takes the top k. Swap `block_col` for an LSH band or IVF cell id for
    approximate-NN at scale — the plan shape is identical.
    """
    a = embeddings.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    )
    b = embeddings.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")
    )
    pairs = (
        a.join(b, on="blk")
        .filter(F.col("qid") != F.col("nid"))
        .select("blk", "qid", "nid", cosine_sim(F.col("qv"), F.col("nv")).alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(F.col("qid").alias(id_col), "nid", "cos_sim", "rn")
    )
