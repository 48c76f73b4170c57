"""Scale-up smoke test: verify headline plans scale ~linearly.

Stages an 8×-inflated copy of sf0.1 under /tmp with DISJOINT keys per
copy (key offsets keep join selectivity constant — naive file
duplication would multiply join outputs 64×), then times representative
operators at 1× and 8× and reports the scaling ratio. A healthy
distributed plan lands near 8× (or below, where fixed overheads
amortize); a superlinear ratio flags a plan that would not survive
100 TB. Results are recorded in SCALE.md.

Usage: python tools/scale_smoke.py [ops ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_scale_smoke/sf0.8"
COPIES = 8

#: table -> columns to offset per copy (disjoint key spaces).
KEYED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "nation": [],   # bounded dims stay bounded at any scale
    "region": [],
}

OFFSET = 100_000_000  # far past any real key at sf0.1

DEFAULT_OPS = [
    "agg_basic",
    "join_inner_equi",
    "join_broadcast",
    "win_running_sum",
    "topk_per_group",
    "text_tfidf",
    "dedup_minhash",
    "tpch_q18",
    "funnel_steps",
    "join_range_bucketed",
    "seq_pack",
    "sim_batch_topk",
]


def stage(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    for t, keys in KEYED.items():
        out = os.path.join(DST, f"{t}.parquet")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        src = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        if not keys:
            src.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for i in range(COPIES):
            cp = src
            for k in keys:
                cp = cp.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            parts.append(cp)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(out)
        print(f"staged {t} x{COPIES}", file=sys.stderr)


def main() -> None:
    from xlsx_to_database_spark.registry import all_queries
    from xlsx_to_database_spark.session import get_spark

    spark = get_spark("scale_smoke")
    stage(spark)
    qs = all_queries()
    ops = sys.argv[1:] or DEFAULT_OPS
    print(f"{'op':24} {'1x(s)':>8} {'8x(s)':>8} {'ratio':>6}")
    for name in ops:
        fn = qs[name]
        fn(spark, SRC).count()  # warm (codegen/planning)
        t0 = time.perf_counter()
        fn(spark, SRC).count()
        t1 = time.perf_counter() - t0
        fn(spark, DST).count()  # warm
        t0 = time.perf_counter()
        fn(spark, DST).count()
        t8 = time.perf_counter() - t0
        print(f"{name:24} {t1:8.2f} {t8:8.2f} {t8 / max(t1, 1e-9):6.1f}")


if __name__ == "__main__":
    main()
