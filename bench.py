"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "total_headline_sec", "value": N, "unit": "sec",
   "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1}

Each query is fully executed via the `noop` sink (computes everything,
writes nothing — no driver collect bottleneck, no result materialization
skew), which is how you'd benchmark a cluster job.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",    # scan → filter → hash agg
    "q04_multi_join_revenue", # star join, broadcast dims
    "q07_topk_per_group",     # rank window
    "q12_running_total",      # cumulative window
    "q14_grid_agg",           # grid-cell stats (reference A1)
    "q24_collect_sorted",     # sorted list agg
    "q27_tumbling_window",    # event-time window
    "q29_session_window",     # session window
    "q33_minhash_lsh",        # MinHash-LSH near-dup
    "q35_cosine_topk",        # vector top-k
    "q38_radius_join",        # spatial radius join
    "q57_asof_join",          # as-of temporal join
    "q96_tfidf_top_terms",    # corpus TF-IDF (explode + 2 aggs + rank)
    "q100_contamination",     # n-gram overlap, broadcast bench set
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from re_data_pipeline_spark.plans.queries import QUERIES
    from re_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the smallest table so q01 isn't billed for it
    QUERIES["q01_pricing_summary"](spark, sf_dir).limit(1).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_headline_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
