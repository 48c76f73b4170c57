"""Split each headline op's wall-clock into build (driver-side work +
internal actions inside the query function) vs count (final-plan
execution) — guide §1: know where the time goes before touching code.

Usage: python tools/phase_profile.py [op ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE
    from xlsx_to_database_spark.registry import all_queries
    from xlsx_to_database_spark.session import get_spark

    spark = get_spark("phase-profile")
    qs = all_queries()
    names = sys.argv[1:] or HEADLINE
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    for name in names:  # pre-stage, untimed (same as bench)
        qs[name](spark, SF_DIR).count()

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    print(f"{'op':28s} {'build':>8s} {'count':>8s} {'total':>8s}")
    for name in names:
        builds, counts = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            counts.append(t2 - t1)
        print(
            f"{name:28s} {med(builds):8.3f} {med(counts):8.3f} "
            f"{med(builds) + med(counts):8.3f}"
        )


if __name__ == "__main__":
    main()
