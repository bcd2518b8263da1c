"""Dump .explain('formatted') for headline queries into plans/r16/ (override with $SPARK_GRAFT_PLAN_ROUND).

Usage: python scripts/dump_plans.py <suffix> [query ...]
Writes plans/<round>/<query>_<suffix>.txt for each named query (default: a
pinned heavy set). Plan capture is driver-only (no job runs).
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

HEAVY = [
    "pipeline_pretrain",
    "similarity_pq",
    "ngram_repetition",
    "dedup_minhash",
    "dedup_clusters_star",
    "semdedup_fixed",
    "unigram_tokenize",
    "pipeline_ccnet",
    "pipeline_fineweb",
    "quality_classifier",
    "lang_ngram_fixed",
    "bpe_tokenize",
    "dsir_weights",
    "ivf_fixed_centroids",
    "pq_residual_fixed",
    "contamination_check",
    "url_etld_cap",
    "kn_bigram_scores",
    "pipeline_retrieval",
    "dedup_exact",
    "agg_pricing_summary",
    "duplicate_spans",
    "dedup_span_rewrite",
    "scan_filter_project",
    "media_near_dup",
    "embedding_clusters",
    "srp_multitable_ann",
    "pq_refine_fixed",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEAVY
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        HERE, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16")
    )
    os.makedirs(out_dir, exist_ok=True)

    from chapterhousedb_spark.session import build_session
    from chapterhousedb_spark.workload import QUERIES

    spark = build_session(app_name="chdb-plan-dump")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 - record the failure in place
            plan = f"PLAN CAPTURE FAILED: {e!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", f"{name}_{suffix}.txt", len(plan), "chars")
        from chapterhousedb_spark.operators.dedup import release_self_join_caches

        release_self_join_caches()


if __name__ == "__main__":
    main()
