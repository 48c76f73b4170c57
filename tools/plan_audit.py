"""Plan-hazard sweep over EVERY registered op.

tests/test_plans.py asserts plan properties for ~25 hand-picked ops;
this tool is the dragnet: it builds each op's physical plan (no
execution for pure queries — ops that stage files or drain streams do
run) and greps it for the constructs that kill 100 TB jobs:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — quadratic joins;
- ``BatchEvalPython`` — row-at-a-time Python UDFs in the data path;
- ``PythonUDTF`` fallback paths are fine (udtf op's point);

and prints one JSON line per offending op plus a summary. Ops whose
SEMANTICS require a hazard are allowlisted with the reason — the audit
exists to catch the UNINTENDED ones. tests/test_plans.py::
test_plan_hazard_allowlist pins the sweep's result so a new hazard
fails CI, not a reviewer's eye.

Usage: python tools/plan_audit.py [op ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: The scalar-attach pattern: ``crossJoin(F.broadcast(<one-row frame>))``
#: plans as BroadcastNestedLoopJoin but is O(n·1) — the build side is a
#: global aggregate (corpus total, threshold, Gram matrix) or a one-row
#: query-vector filter. It is the INTENDED way to hand every row a
#: scalar without a driver collect.
_SCALAR_ATTACH = (
    "BNLJ is crossJoin(broadcast(one-row frame)) — O(n*1) scalar attach"
)

#: op -> (hazard, reason) pairs that are BY DESIGN.
ALLOWED: dict[str, dict[str, str]] = {
    "join_cross": {
        "CartesianProduct": "the op IS a cross join (bounded dims)",
        "BroadcastNestedLoopJoin": "Spark plans small cross joins as BNLJ",
    },
    "join_theta": {
        "BroadcastNestedLoopJoin": "non-equi predicate on a bounded build side",
        "CartesianProduct": "theta joins without equi-conjuncts are cartesian by definition",
    },
    "join_interval": {
        "BroadcastNestedLoopJoin": "range-overlap predicate; bucket rewrite is join_range_bucketed",
    },
    "udf_python": {
        "BatchEvalPython": "the op demonstrates the row-at-a-time UDF surface",
    },
    "udtf_python": {
        "BatchEvalPython": "UDTF evaluation is Python by definition (the op's surface)",
    },
    "join_lateral": {
        "BroadcastNestedLoopJoin": "lateral correlation over a bounded per-row subquery",
    },
    "recursive_cte": {
        "BroadcastNestedLoopJoin": "fixpoint step joins a bounded frontier",
    },
    "tpch_q22": {
        "BroadcastNestedLoopJoin": "scalar AVG subquery broadcast — Q22's defining shape",
    },
    "etl_calendar_scaffold": {
        "BroadcastNestedLoopJoin": (
            "day-spine × event-type scaffold cross join — both sides "
            "metadata-bounded (calendar span × distinct types)"
        ),
    },
    # Scalar-attach crossJoins (see _SCALAR_ATTACH): global totals,
    # percentile thresholds, Gram/centroid matrices, one-row query
    # vectors.
    **{
        op: {"BroadcastNestedLoopJoin": _SCALAR_ATTACH}
        for op in (
            "corpus_quality_gate",    # percentile thresholds (1 row)
            "corpus_mix_schedule",    # corpus totals (1 row)
            "stat_chi2",              # expected-counts totals (1 row)
            "text_perplexity",        # vocab-mass total N (1 row)
            "stat_psi_drift",         # the two distributions' totals (1 row)
            "sim_range_search",       # query vector (1 row)
            "csv_malformed_scan",     # schema-free line count (1 row)
            "etl_surrogate_keys",     # max existing key K (1 row)
            "stat_benford",           # digit total (1 row)
            "stat_cuped",             # CUPED moment frame (1 row)
            "graph_triangles",        # triangle-count scalar (1 row)
            "dedup_embedding",        # label-block centroid stats (1 row)
            "sim_cosine_topk",        # query vector (1 row)
            "sim_ivf_topk",           # query vector (1 row)
            "sim_ivf_matrix_topk",    # query vector (1 row)
            "sim_ivfpq_topk",         # query probe-cell row (1 row)
            "sim_ivfsq_topk",         # query probe-cell row (1 row)
            "sim_binary_rerank_topk",  # query vector (1 row) for the rerank
            "sim_ivf_trained_topk",   # query probe-cell row (1 row)
            "text_tfidf",             # corpus doc count N (1 row)
            "sim_batch_topk",         # batched query vectors (k rows, k small)
            "dq_checks",              # per-check scalar aggregates unioned
            "assoc_rules",            # order-count total N (1 row)
            "sim_two_tier",           # query vector (1 row)
            "stat_mutual_info",       # cell-count total N (1 row)
            "text_pmi",               # bigram/unigram totals (1 row)
            "ml_naive_bayes",         # corpus total N + vocab size V (1 row)
            "stat_cramers_v",         # contingency totals (1 row, as stat_chi2)
            "ml_decision_stump",      # class-prior totals (1 row)
            "stat_runs_test",         # run/median totals (1 row)
            "stat_jackknife_ratio_se",  # leave-one-out base totals (1 row)
            "agg_weighted_median",    # half-weight threshold W/2 (1 row)
            "sim_maxsim",             # query sub-vectors (1 row)
            "ml_knn_classify",        # query batch (10 rows)
            "ml_roc_auc",             # pos/neg totals + Youden argmax (1 row)
            "dedup_threshold_sweep",  # threshold spine (5 rows)
            "stat_ht_estimate",       # ground-truth total (1 row)
            "agg_time_decay",         # corpus max timestamp (1 row)
            "etl_bitemporal",         # as-of axis (2 rows)
            "dq_freshness",           # global max timestamp (1 row)
            "ml_pr_curve",            # threshold spine (5 rows)
            "sample_balanced_classes",  # min-class-size k (1 row)
            "stat_hurst",             # two 1-row octave summaries joined
            "geo_haversine_nearest",  # warehouse sites (5 rows)
            "interval_point_stab",    # probe axis (4 rows)
            "ml_kfold_cv",            # threshold spine (5 rows)
            "stat_lorenz_curve",      # decile-sum total (1 row)
            "udtf_sql",               # 12-row month spine band join
            "stat_beta_binomial_eb",  # Beta prior (1 row)
            "ml_isotonic_calibration",  # 10-row bin intervals (<=10^3)
            "sim_mips_transform",     # max-norm M + query vector (1 row each)
            "etl_scd2_snapshot",      # snapshot axis (4 rows)
            "graph_modularity",       # 1-row Q scalar joined to counts
            "ml_cluster_purity",      # 8 broadcast centroids
            "text_js_divergence",     # slice totals + JS sum (1 row each)
            "stat_fdr_bh",            # global moments + k* scalar (1 row each)
            "ml_learning_curve",      # fraction spine (4 rows)
            "sim_recall_report",      # query vector + 10-row top-k sets
            "ml_threshold_cost_opt",  # threshold spine (5 rows)
            "stat_ljung_box",         # lag spine (5) + c0 scalar on the DAYS series
            "ml_reg_metrics",         # fitted-line coefficients (1 row)
            "stat_entropy_rate",      # transition-total scalar (1 row)
            "agg_waterfall_decomp",   # delta-total scalar (1 row)
        )
    },
    "stat_kendall_tau": {
        "BroadcastNestedLoopJoin": (
            "inequality cell-pair join over the CONTINGENCY TABLE "
            "(|X|·|Y| rows — metadata scale at any corpus size), "
            "broadcast by construction; the fact table is touched only "
            "by the first equi-aggregate"
        ),
    },
}

HAZARDS = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")


def main() -> int:
    from xlsx_to_database_spark.plans import explain_str
    from xlsx_to_database_spark.registry import all_queries
    from xlsx_to_database_spark.session import get_spark

    spark = get_spark("plan_audit")
    qs = all_queries()
    only = sys.argv[1:]
    names = only or list(qs)
    unexpected: list[dict] = []
    checked = 0
    for name in names:
        try:
            plan = explain_str(qs[name](spark, SF_DIR))
        except Exception as e:  # staging/stream ops can fail offline paths
            print(json.dumps({"op": name, "error": str(e)[:120]}))
            continue
        checked += 1
        found = [h for h in HAZARDS if h in plan]
        bad = [h for h in found if h not in ALLOWED.get(name, {})]
        if bad:
            unexpected.append({"op": name, "hazards": bad})
            print(json.dumps({"op": name, "hazards": bad}))
    print(
        json.dumps(
            {
                "checked": checked,
                "unexpected_hazards": len(unexpected),
                "allowlisted": sorted(ALLOWED),
            }
        )
    )
    return 1 if unexpected else 0


if __name__ == "__main__":
    raise SystemExit(main())
