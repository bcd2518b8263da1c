"""Per-query profile: split construction (driver orchestration: fits,
iterative solves, fixture builds) from execution (the final action), and
count Spark jobs in each phase.

Usage: python scripts/profile_query.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from chapterhousedb_spark.operators.dedup import release_self_join_caches
    from chapterhousedb_spark.session import build_session
    from chapterhousedb_spark.workload import QUERIES

    spark = build_session(app_name="chdb-profile")
    sc = spark.sparkContext
    # warmup (JVM/codegen)
    QUERIES["scan_filter_project"](spark, sf_dir).limit(1).collect()

    def n_jobs() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None) or [])

    out = {}
    for name in names:
        j0, t0 = n_jobs(), time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        j1, t1 = n_jobs(), time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        j2, t2 = n_jobs(), time.perf_counter()
        release_self_join_caches()
        out[name] = {
            "construct_sec": round(t1 - t0, 3),
            "exec_sec": round(t2 - t1, 3),
            "construct_jobs": j1 - j0,
            "exec_jobs": j2 - j1,
        }
        print(name, json.dumps(out[name]), flush=True)
    print("TOTALS", json.dumps(out))


if __name__ == "__main__":
    main()
