"""Attribute q153/q169's sf1-anchor wall growth to pipeline phases.

The r14 verdict's open item: both queries' anchor shuffle rows grow
exactly 10.0× at 10× docs, but wall grows 4.9× — more than the
overhead-dominated family (q167 1.2×) and the verdict asks WHERE the
time goes (candidate count? per-candidate verify cost? a skewed verify
partition?) with measured numbers.

This probe runs each query's pipeline in two cuts at sf0.1 and at the
sf1 replica corpus (tools/sf1_anchor.py's construction, same host):

- CANDIDATES cut: everything up to and including the candidate pair
  list (prefix explode + equi-join + distinct) — wall, cumulative
  executor CPU (REST `executorRunTime`), candidate count.
- FULL cut: the registered query — wall, CPU; verify-attributed wall =
  full − candidates (both cold, best-of-2).

plus the verify stage's INPUT MASS (rows entering the intersection
legs) and its KEY-LEVEL skew (max vs median per-key fan-out): a hot
verify key would show up as max ≫ median while totals stay linear.

Usage: python tools/verify_attr_probe.py   (~4-6 min; prints a table)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from re_data_pipeline_spark.session import get_spark

SF01_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpu_ms(ui: str, app_id: str) -> int:
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("executorRunTime", 0) for s in stages)


def _q153_cands(spark, sf_dir):
    from re_data_pipeline_spark.catalog import load_table
    from re_data_pipeline_spark.operators.dedup import prefix_filter_pairs

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    return prefix_filter_pairs(
        d, "doc_id", "text", threshold_num=4, threshold_den=5, on_degradation="off"
    )


def _q169_cands(spark, sf_dir):
    # the operator's OWN candidate cut (dedup._containment_candidates) —
    # shared code, so the probe cannot silently diverge from q169's exprs
    from re_data_pipeline_spark.catalog import load_table
    from re_data_pipeline_spark.functions.text import tokens
    from re_data_pipeline_spark.operators.dedup import _containment_candidates

    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 7 == 0)
        .select("doc_id", "text")
    )
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    )
    return _containment_candidates(
        toks, d, "doc_id", 9, 10, on_degradation="off", cap_pairs_per_doc=64
    )


def _verify_mass_q153(spark, sf_dir, cands):
    """Rows entering jaccard_on_pairs' intersection legs: Σ(sz_a + sz_b)
    over candidate pairs (shingle_words=1 → distinct whitespace tokens),
    plus per-doc pair fan-out skew."""
    from re_data_pipeline_spark.catalog import load_table
    from re_data_pipeline_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    sizes = d.select(
        "doc_id", F.size(F.array_distinct(tokens(F.col("text")))).alias("sz")
    )
    mass = (
        cands.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sa"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sb"), "id_b")
        .agg(F.sum(F.col("sa") + F.col("sb")).alias("m"))
        .first()["m"]
    )
    fan = (
        cands.select(F.col("id_a").alias("k"))
        .unionAll(cands.select(F.col("id_b").alias("k")))
        .groupBy("k")
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.expr("percentile_approx(count, 0.5)").alias("md"),
        )
        .first()
    )
    return int(mass or 0), int(fan["mx"] or 0), int(fan["md"] or 0)


def _verify_mass_q169(spark, sf_dir, cands):
    """Rows entering the intersection-count leg: Σ |T(a)| over candidates,
    plus per-id_a candidate fan-out skew."""
    mass = cands.agg(F.sum("__na")).first()[0]
    fan = (
        cands.groupBy("id_a")
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.expr("percentile_approx(count, 0.5)").alias("md"),
        )
        .first()
    )
    return int(mass or 0), int(fan["mx"] or 0), int(fan["md"] or 0)


def main() -> int:
    from tools.sf1_anchor import build_sf1_documents

    from re_data_pipeline_spark.plans.queries import QUERIES

    spark = get_spark(app_name="verify_attr_probe", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "100000",
    })
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    stage_dir = tempfile.mkdtemp(prefix="verify_attr_")
    try:
        n = build_sf1_documents(spark, stage_dir)
        print(f"sf1 corpus: {n:,} docs at {stage_dir}")

        def timed(df_fn, action="noop", runs=2):
            # wall and CPU are kept as a PAIR from the best-wall run — an
            # unconditional overwrite would report run N's CPU against a
            # different run's wall (r15 review finding)
            best, best_cpu, count = float("inf"), 0.0, None
            for _ in range(runs):
                spark.catalog.clearCache()
                c0 = _cpu_ms(ui, app_id)
                t0 = time.time()
                frame = df_fn()
                if action == "count":
                    count = frame.count()
                else:
                    frame.write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                cpu = (_cpu_ms(ui, app_id) - c0) / 1000.0
                if wall < best:
                    best, best_cpu = wall, cpu
            return best, best_cpu, count

        probes = {
            "q153_prefix_filter_join": (_q153_cands, _verify_mass_q153),
            "q169_containment_best": (_q169_cands, _verify_mass_q169),
        }
        for name, (cand_fn, mass_fn) in probes.items():
            for label, sf in (("sf0.1", SF01_DIR), ("sf1", stage_dir)):
                cw, ccpu, n_cands = timed(
                    lambda: cand_fn(spark, sf), action="count"
                )
                fw, fcpu, _ = timed(lambda: QUERIES[name](spark, sf))
                spark.catalog.clearCache()
                mass, mx, md = mass_fn(spark, sf, cand_fn(spark, sf))
                spark.catalog.clearCache()
                print(
                    f"{name} @{label}: cand={cw:.2f}s (cpu {ccpu:.1f}s, "
                    f"{n_cands:,} pairs) full={fw:.2f}s (cpu {fcpu:.1f}s) "
                    f"verify-attr={fw - cw:+.2f}s verify-mass={mass:,} "
                    f"fanout max/med={mx}/{md}"
                )
        return 0
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
