"""Capture .explain("formatted") for headline (or given) ops.

Usage: python tools/capture_plans.py <suffix> [op ...]

Writes plans/r13/<op>_<suffix>.txt for each op (suffix is e.g.
"before" / "after"). Ops that stage fixtures or drain streams execute
their staging as a side effect of building the DataFrame; the captured
plan is the final returned frame's plan, same as what bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")


def main() -> None:
    from bench import HEADLINE
    from xlsx_to_database_spark.registry import all_queries
    from xlsx_to_database_spark.session import get_spark

    if len(sys.argv) < 2:
        sys.exit("usage: capture_plans.py <suffix> [op ...]")
    suffix = sys.argv[1]
    ops = sys.argv[2:] or HEADLINE

    spark = get_spark("plan-capture")
    qs = all_queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in ops:
        df = qs[name](spark, SF_DIR)
        # Execute THIS DataFrame's own queryExecution so AQE finalizes
        # the plan (isFinalPlan=true): runtime exchange reuse / join
        # rewrites only show up in the final plan. df.count() would
        # build a different queryExecution and leave this one initial;
        # executing the physical plan's RDD JVM-side runs the exact
        # plan without shipping rows to the driver.
        df._jdf.queryExecution().executedPlan().execute().count()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path} ({plan.count('Exchange')} Exchange mentions)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
