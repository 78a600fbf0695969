"""Partition-pruning probe for q222's receipt audit (r18).

q222's fixture stores `documents` as ONE flat parquet file, so the
divergent-shard `IN` predicate is evaluated inside the scan but every row
is still READ — the fixture wall is corpus-proportional even though the
row-level work is divergence-proportional.  The production claim
(`corpus_receipt_diff` docstring) is that under a shard-PARTITIONED
layout the same literal predicate becomes real partition pruning: only
the divergent shards' files are opened.

This probe makes that claim a measurement: it stages both corpus
versions partitioned by the receipt shard key
(``.write.partitionBy(shard)`` — the layout a production corpus handoff
would use, since the shard key IS the manifest's localization unit),
stages both frozen receipts, and times/measures `corpus_receipt_diff`
with receipts injected:

- **flat layout** — the fixture shape: both corpora as monolithic
  parquet; the IN predicate filters after a full read;
- **shard-partitioned layout** — the production shape: the corpora
  carry `shard` as a real partition column, `corpus_receipt_diff` is
  told so (`stored_shard_col="shard"`), the predicate prunes at the
  file index, and `input_records` (Spark status REST) drops to exactly
  the divergent shards' row mass.  (First probe iteration measured 0%
  pruned when the operator recomputed the shard from the id even on
  partitioned storage — an md5 expression is opaque to the file index;
  that finding drove the `stored_shard_col` parameter.)

The deltas computed by both layouts are asserted identical first.
Scales: sf0.1 and the sf1 replica corpus.  Min of 2 noop-sink runs,
cold cache per run.

Usage: python tools/q222_pruning_probe.py   (~2-4 min; prints a table —
SCALING.md's q222 paragraph quotes it)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from re_data_pipeline_spark.session import get_spark
from tools.rest_metrics import stage_totals

SF01_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_SHARDS = 16


def _corpora(spark, sf_dir: str):
    """The q222 fixture pair (A, B) — same construction as the query body."""
    from re_data_pipeline_spark.catalog import load_table
    from re_data_pipeline_spark.operators.maintenance import _md5_60, _nullsafe_str

    def shard16(col):
        return F.pmod(_md5_60(_nullsafe_str(col)), F.lit(NUM_SHARDS)).cast("int")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    s = shard16(F.col("doc_id"))
    b = (
        d.where(s != 3)
        .select(
            "doc_id",
            F.when(
                (s == 7) & (F.col("doc_id") % 5 == 0),
                F.concat(F.col("text"), F.lit(" [rewritten]")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
        )
        .unionByName(
            d.where(F.col("doc_id") % 13 == 6)
            .select(
                (F.col("doc_id") + F.lit(50000000)).alias("doc_id"),
                F.concat(F.lit("stray append of "), F.col("text")).alias("text"),
                "lang",
            )
            .where(shard16(F.col("doc_id")) == 11)
        )
    )
    return d, b, shard16


def stage(spark, sf_dir: str, out: str) -> None:
    """Untimed: persist both corpus versions flat AND shard-partitioned,
    plus both frozen receipts — what a production handoff would hold."""
    from re_data_pipeline_spark.operators.maintenance import shard_manifest

    a, b, shard16 = _corpora(spark, sf_dir)
    for name, df in (("a", a), ("b", b)):
        df.write.parquet(os.path.join(out, f"{name}_flat"))
        df.withColumn("shard", shard16(F.col("doc_id"))).write.partitionBy(
            "shard"
        ).parquet(os.path.join(out, f"{name}_part"))
        shard_manifest(
            spark.read.parquet(os.path.join(out, f"{name}_flat")),
            "doc_id",
            ["text", "lang"],
            num_shards=NUM_SHARDS,
        ).write.parquet(os.path.join(out, f"manifest_{name}"))


def run_diff(spark, state: str, layout: str):
    """corpus_receipt_diff with injected receipts over the given layout.
    The partitioned layout keeps its materialized `shard` partition
    column and declares it via `stored_shard_col`."""
    from re_data_pipeline_spark.operators.maintenance import corpus_receipt_diff

    suffix = "part" if layout == "partitioned" else "flat"
    a = spark.read.parquet(os.path.join(state, f"a_{suffix}"))
    b = spark.read.parquet(os.path.join(state, f"b_{suffix}"))
    return corpus_receipt_diff(
        a,
        b,
        num_shards=NUM_SHARDS,
        manifest_a=spark.read.parquet(os.path.join(state, "manifest_a")),
        manifest_b=spark.read.parquet(os.path.join(state, "manifest_b")),
        # the production layout carries the shard as a REAL partition
        # column — the operator filters on it directly, so the literal
        # IN predicate prunes at the file index instead of filtering an
        # opaque md5 expression after a full read
        stored_shard_col="shard" if layout == "partitioned" else None,
    )["deltas"]


def timed(spark, ui, app_id, state: str, layout: str, runs: int = 2):
    best, rec = float("inf"), 0
    for _ in range(runs):
        spark.catalog.clearCache()
        before = stage_totals(ui, app_id)
        t0 = time.time()
        run_diff(spark, state, layout).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.time() - t0)
        rec = stage_totals(ui, app_id)["input_records"] - before["input_records"]
    return best, rec


def main() -> int:
    from tools.sf1_anchor import build_sf1_documents

    spark = get_spark(app_name="q222_pruning_probe", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "100000",
    })
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    print("loadavg at launch:", open("/proc/loadavg").read().strip())

    root = tempfile.mkdtemp(prefix="q222_probe_")
    try:
        build_sf1_documents(spark, root)
        rows = []
        for label, sf_dir in (("sf0.1", SF01_DIR), ("sf1", root)):
            st = os.path.join(root, f"state_{label}")
            os.makedirs(st, exist_ok=True)
            stage(spark, sf_dir, st)
            # correctness first: both layouts must report identical deltas
            flat = {tuple(r) for r in run_diff(spark, st, "flat").collect()}
            part = {tuple(r) for r in run_diff(spark, st, "partitioned").collect()}
            assert flat == part, f"layout divergence at {label}"
            fw, fr = timed(spark, ui, app_id, st, "flat")
            pw, pr = timed(spark, ui, app_id, st, "partitioned")
            rows.append((label, len(flat), fw, fr, pw, pr))
            print(
                f"{label}: deltas={len(flat)} flat={fw:.2f}s/{fr:,} input rows "
                f"partitioned={pw:.2f}s/{pr:,} input rows "
                f"({(1 - pr / fr) * 100:.0f}% of the read pruned)"
            )
        print("\n| scale | deltas | flat wall | flat input rows | "
              "partitioned wall | partitioned input rows | read pruned |")
        print("|---|---|---|---|---|---|---|")
        for label, n, fw, fr, pw, pr in rows:
            print(
                f"| {label} | {n} | {fw:.2f}s | {fr:,} | {pw:.2f}s | {pr:,} "
                f"| {(1 - pr / fr) * 100:.0f}% |"
            )
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
