"""bench.py's exact timing protocol over a NAMED SUBSET of queries.

Same methodology as bench.py (cold-cache runs, min-of-N, noop sink,
plan-hash probe first, spine/checkpoint release between runs) so subset
numbers are comparable with the full records — used for the r18
optimization round's per-change before/after evidence without paying a
full 49-query run per iteration.

Usage: python tools/bench_subset.py <query> [query ...]
Prints one JSON line: {"queries": {...}, "plan_hashes": {...},
"loadavg_start": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import plan_hash  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from re_data_pipeline_spark.operators.ids import (
        release_local_checkpoint,
        release_spines,
    )
    from re_data_pipeline_spark.plans.queries import QUERIES
    from re_data_pipeline_spark.session import get_spark

    loadavg = list(os.getloadavg())
    spark = get_spark(app_name="bench_subset")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q01_pricing_summary"](spark, sf_dir).limit(1).collect()

    timings: dict[str, float] = {}
    plans: dict[str, str] = {}
    for name in names:
        fn = QUERIES[name]
        try:
            probe = fn(spark, sf_dir)
            plans[name] = plan_hash(probe)
            release_spines(probe)
            release_local_checkpoint(probe)
        except Exception:
            plans[name] = "n/a"
        best = float("inf")
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            release_spines(df)
            release_local_checkpoint(df)
        timings[name] = round(best, 3)
        spark.catalog.clearCache()

    print(json.dumps({
        "queries": timings,
        "plan_hashes": plans,
        "runs_per_query": n_runs,
        "loadavg_start": loadavg,
    }))


if __name__ == "__main__":
    main()
