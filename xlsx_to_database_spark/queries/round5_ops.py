"""Round-5 additions: fixed-window chunking, shingle containment pairs,
and the grid-bucketed 2-D radius join — three pipeline shapes the §2
inventory did not yet cover (pretraining chunk prep, superset/quote
dedup, spatial-style radius joins).

Registered LAST in the registry import order (the round4_ops pattern):
the round-5 driver window is backlog(44) + reopened(3); these three fill
its three spare slots without displacing anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xlsx_to_database_spark.catalog import table
from xlsx_to_database_spark.operators import dedup as D
from xlsx_to_database_spark.registry import query

_CHUNK_W = 32  #: tokens per chunk
_CHUNK_S = 16  #: stride (W/2 -> 50% overlap, the usual pretraining choice)


@query(
    "text_chunk_split",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), idx AS (
      SELECT unnest(range(0, 16)) AS i
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
           array_to_string(t[i*{_CHUNK_S}+1 : i*{_CHUNK_S}+{_CHUNK_W}], ' ') AS chunk,
           CAST(len(t[i*{_CHUNK_S}+1 : i*{_CHUNK_S}+{_CHUNK_W}]) AS INT) AS n_tok
    FROM toks JOIN idx ON i <= (len(t) - 1) // {_CHUNK_S}
    """,
)
def text_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window token chunking with 50% overlap — the step that turns
    variable-length documents into trainer/retriever-sized pieces
    (`seq_pack` is the packing half; this is the splitting half). Chunk
    ``chunk_id`` starts at token ``chunk_id·S``, spans up to W tokens;
    every token is covered, interior tokens twice (stride S = W/2).

    Scale shape: map-only — one codegen `transform` over the token
    array builds all windows, `posexplode` flattens; no shuffle, no UDF,
    no join. Output rows ≈ input tokens × (W/S)/W · ... ≈ 2·tokens/W;
    the explode's row growth is the op's deliberate output, not a plan
    accident. The DuckDB oracle drives the same windows off an integer
    series join (docs here are ≤ 99 tokens → i < 16 bounds the series;
    the Spark side needs no such bound since `sequence` is data-sized).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size("t") - 1) / _CHUNK_S).cast("int"),
                ),
                lambda i: F.slice("t", i * _CHUNK_S + 1, _CHUNK_W),
            )
        ).alias("chunk_id", "win"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("int"),
        F.array_join("win", " ").alias("chunk"),
        F.size("win").alias("n_tok"),
    )


@query(
    "text_containment",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t) - 1)]) AS s
      FROM toks WHERE len(t) >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.s, b.s))::DOUBLE / len(a.s), 6)
             AS containment
    FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
    WHERE round(len(list_intersect(a.s, b.s))::DOUBLE / len(a.s), 6) >= 0.9
    """,
)
def text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional near-superset screening: pairs where ≥ 90% of doc_a's
    word-3-gram shingles appear in doc_b — quote-inclusion / boilerplate
    wrapping / templated-superset cases that Jaccard structurally misses
    (a short doc inside a long one has J ≈ 0, C ≈ 1). Candidates via the
    asymmetric prefix filter (A blocks on its rarest shingles, B on all;
    zero false negatives — proof at operators/dedup.py::
    containment_pairs), verified exactly. The oracle is the defining
    cross product."""
    return D.containment_pairs(
        table(spark, sf_dir, "documents"), threshold=0.9, shingle=3
    )


_RADIUS = 0.02


@query(
    "join_grid_radius",
    f"""
    WITH pts AS (
      SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
             CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(sqrt(power(a.x - b.x, 2) + power(a.y - b.y, 2)), 6) AS dist
    FROM pts a JOIN pts b ON a.vec_id < b.vec_id
    WHERE round(sqrt(power(a.x - b.x, 2) + power(a.y - b.y, 2)), 6)
          <= {_RADIUS}
    """,
)
def join_grid_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within Euclidean radius r in the plane of the
    first two embedding dimensions — the grid-bucketed spatial radius
    join (geo joins, collision detection, blocking for record linkage).

    Plan: snap each point to an r-sized grid cell; ONE side explodes to
    its 3×3 cell neighborhood, the other keys by its own cell; equi-join
    on the cell id, then the exact distance filter. dist ≤ r bounds
    each coordinate delta by r, so a qualifying pair's cells differ by
    ≤ 1 per axis and the neighborhood join has zero false negatives;
    each pair meets exactly once (the unexploded side sits in one cell,
    the exploded side covers it once, and the id_a < id_b filter keeps
    one orientation) — no distinct needed. This is an equi-shuffle on
    cell id: no cross join anywhere, candidate volume is Σ_cell
    9·|cell|², which r controls; at 100 TB dense cells are ordinary AQE
    skew-join work, and the 9× expansion sits on the probe side of a
    shuffled hash join. The oracle is the defining cross product.
    Exactness: float→double widening is exact on both engines, sqrt/pow
    are bit-identical libm calls, and the 6dp-rounded distance is what
    both sides threshold on."""
    e = table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    )
    cell = lambda c: F.floor(c / _RADIUS).cast("long")  # noqa: E731
    left = pts.select(
        F.col("vec_id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (cell(F.col("x")) + dx).alias("cx"),
                        (cell(F.col("y")) + dy).alias("cy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("c"),
    ).select("id_a", "xa", "ya", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    right = pts.select(
        F.col("vec_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        cell(F.col("x")).alias("cx"),
        cell(F.col("y")).alias("cy"),
    )
    dist = F.round(
        F.sqrt(
            F.pow(F.col("xa") - F.col("xb"), 2) + F.pow(F.col("ya") - F.col("yb"), 2)
        ),
        6,
    )
    return (
        left.join(right, on=["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("dist"))
        .filter(F.col("dist") <= _RADIUS)
    )
