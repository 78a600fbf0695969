"""Production-wall probe for q220's maintenance core (r16 verdict task 3).

q220's fixture RECOMPUTES frozen-A state (curated rows, LSH bucket index,
shard manifest) for self-containment, so its bench/anchor wall is an UPPER
bound on the production incremental-ingest cost — production loads every
frozen piece from storage.  This probe measures the true maintenance-core
production wall by staging the frozen state to parquet (untimed, the state
a prior run would have written) and then timing
``operators/maintenance.incremental_corpus_update`` two ways over the SAME
loaded ``a_fin`` / ``b_cur`` parquet frames:

- **fixture path** — ``index_a``/``manifest_a`` omitted: the operator
  recomputes A's bucket index (corpus minhash+banding) and A's manifest,
  exactly what the q220 query body pays;
- **production path** — ``index_a``/``manifest_a`` loaded from parquet:
  A's payload is touched only by the span tier's anchor pass.

Both paths share the pre-gated batch, so the delta isolates exactly what
frozen-state injection saves.  The full q220 fixture query is timed in the
same session for context.

r18 adds the **production wall** row: the frozen LM (``ngram_lm_train``'s
four tables) and the per-language CCNet thresholds are staged alongside
the index/manifest, and the timed path starts from B's pre-LM
blocklist/Gopher survivors — score under the LOADED model
(``ngram_lm_nll(model=...)``), frozen-threshold cut, then the maintenance
core with index+manifest injected.  That is the entire per-ingest cost a
production daily run pays after acquisition + structural gating; the only
remaining untimed pieces are B's own blocklist/Gopher pass (production
work, batch-sided, identical in every mode) and A's LM training /
curation (paid once per reference refresh, never per ingest).  The gated
batch the production path produces is asserted row-identical to the
fixture's ``b_cur`` before timing.

Scales: sf0.1 and the sf1 replica corpus (``tools/sf1_anchor.py``'s
construction).  Min of 2 noop-sink runs, cold cache per run.

Usage: python tools/q220_production_probe.py   (~4-6 min; prints a table —
SCALING.md's q220 caveat paragraph quotes it)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from re_data_pipeline_spark.session import get_spark

SF01_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def stage_frozen_state(spark, sf_dir: str, out: str) -> None:
    """Untimed: run q220's policy tiers once and persist what a prior
    production run would have written — the curated corpus A, the gated
    batch B, A's LSH bucket index, A's shard manifest, and (r18) the
    gating tier's frozen pieces: the reference LM trained on A's curated
    half, the per-language thresholds, and B's pre-LM survivor set."""
    from re_data_pipeline_spark.catalog import load_table
    from re_data_pipeline_spark.operators.dedup import lsh_bands, minhash_signature
    from re_data_pipeline_spark.operators.ids import (
        release_handles,
        release_local_checkpoint,
    )
    from re_data_pipeline_spark.operators.lm import ngram_lm_train
    from re_data_pipeline_spark.operators.maintenance import shard_manifest
    from re_data_pipeline_spark.plans.queries import _q220_snapshot_cuts

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    frozen: dict = {}
    a_fin, b_cur = _q220_snapshot_cuts(spark, d, frozen_out=frozen)
    a_fin.write.parquet(os.path.join(out, "a_fin"))
    b_cur.write.parquet(os.path.join(out, "b_cur"))
    # the stashed frames recompute through the released curation lineage:
    # stage them now (untimed — a prior run's outputs)
    frozen["a1"].write.parquet(os.path.join(out, "a1"))
    frozen["thr"].write.parquet(os.path.join(out, "thr"))
    release_local_checkpoint(frozen["thr"])
    frozen["b_pre"].write.parquet(os.path.join(out, "b_pre"))
    # the frozen reference model: trained ONCE on the persisted a1, the
    # tables a production deployment loads for every snapshot's scoring
    model = ngram_lm_train(spark.read.parquet(os.path.join(out, "a1")))
    for name, df in model.items():
        df.write.parquet(os.path.join(out, f"lm_{name}"))
        release_handles(df)
    a = spark.read.parquet(os.path.join(out, "a_fin"))
    # the operator's own index/manifest parameters (q220: defaults + 16)
    lsh_bands(
        minhash_signature(a, "text", 16, 3), "doc_id", "minhash", 4, 4
    ).write.parquet(os.path.join(out, "index_a"))
    shard_manifest(a, "doc_id", ["text", "lang"], num_shards=16).write.parquet(
        os.path.join(out, "manifest_a")
    )
    release_local_checkpoint(a_fin)
    release_local_checkpoint(b_cur)


def time_core(spark, state: str, production: bool, runs: int = 2) -> float:
    from re_data_pipeline_spark.operators.ids import release_handles
    from re_data_pipeline_spark.operators.maintenance import incremental_corpus_update

    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        a = spark.read.parquet(os.path.join(state, "a_fin"))
        b = spark.read.parquet(os.path.join(state, "b_cur"))
        frozen = (
            {
                "index_a": spark.read.parquet(os.path.join(state, "index_a")),
                "manifest_a": spark.read.parquet(os.path.join(state, "manifest_a")),
            }
            if production
            else {}
        )
        t0 = time.time()
        upd = incremental_corpus_update(a, b, min_len=10, k=5, num_shards=16, **frozen)
        upd["manifest"].write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
        release_handles(upd["kept"])
    return best


def _gated_batch(spark, state: str):
    """The production-shaped gating tier over loaded frozen state: score
    B's pre-LM survivors under the LOADED reference model, apply the
    frozen per-language thresholds (unknown languages and NULL scores
    fail closed, as in the fixture), and checkpoint the gated batch at
    the curation→dedup stage boundary — exactly `_q220_snapshot_cuts`'
    B-side cut, restarted from storage."""
    from pyspark.sql import functions as F

    from re_data_pipeline_spark.operators.lm import ngram_lm_nll

    b_pre = spark.read.parquet(os.path.join(state, "b_pre"))
    thr = spark.read.parquet(os.path.join(state, "thr"))
    model = {
        name: spark.read.parquet(os.path.join(state, f"lm_{name}"))
        for name in ("tri", "bi", "uni", "stats")
    }
    lm = ngram_lm_nll(None, b_pre, model=model)
    keep = (
        lm.where(F.col("nll").isNotNull())
        .join(b_pre.select("doc_id", "lang"), "doc_id")
        .join(F.broadcast(thr), "lang")
        .where(F.col("nll") <= F.col("thr_nll"))
        .select("doc_id")
    )
    return b_pre.join(keep, "doc_id").localCheckpoint()


def check_gating_parity(spark, state: str) -> None:
    """Untimed, once per scale: the production gating path must reproduce
    the fixture's gated batch row-for-row (same model, same thresholds —
    scoring B alone vs jointly with A cannot change per-doc scores)."""
    from re_data_pipeline_spark.operators.ids import release_local_checkpoint

    b_cur = _gated_batch(spark, state)
    got = sorted(r.doc_id for r in b_cur.select("doc_id").collect())
    want = sorted(
        r.doc_id
        for r in spark.read.parquet(os.path.join(state, "b_cur"))
        .select("doc_id")
        .collect()
    )
    release_local_checkpoint(b_cur)
    assert got == want, (
        f"production gating diverged from fixture b_cur: "
        f"{len(got)} vs {len(want)} rows"
    )


def time_production_wall(spark, state: str, runs: int = 2) -> float:
    """The full per-ingest production wall: LM scoring of B under the
    loaded frozen model + threshold gate + maintenance core, with model,
    thresholds, index, AND manifest all injected from storage."""
    from re_data_pipeline_spark.operators.ids import (
        release_handles,
        release_local_checkpoint,
    )
    from re_data_pipeline_spark.operators.maintenance import incremental_corpus_update

    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        a = spark.read.parquet(os.path.join(state, "a_fin"))
        frozen = {
            "index_a": spark.read.parquet(os.path.join(state, "index_a")),
            "manifest_a": spark.read.parquet(os.path.join(state, "manifest_a")),
        }
        t0 = time.time()
        b_cur = _gated_batch(spark, state)
        upd = incremental_corpus_update(a, b_cur, min_len=10, k=5, num_shards=16, **frozen)
        upd["manifest"].write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
        release_handles(upd["kept"])
        release_local_checkpoint(b_cur)
    return best


def time_full_query(spark, sf_dir: str, runs: int = 2) -> float:
    from re_data_pipeline_spark.plans.queries import QUERIES

    fn = QUERIES["q220_incremental_crawl_update"]
    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    from tools.sf1_anchor import build_sf1_documents

    spark = get_spark(app_name="q220_production_probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("loadavg at launch:", open("/proc/loadavg").read().strip())

    stage = tempfile.mkdtemp(prefix="q220_probe_")
    try:
        n = build_sf1_documents(spark, stage)
        print(f"sf1 documents staged: {n:,}")
        rows = []
        for label, sf_dir in (("sf0.1", SF01_DIR), ("sf1", stage)):
            st = os.path.join(stage, f"state_{label}")
            os.makedirs(st, exist_ok=True)
            stage_frozen_state(spark, sf_dir, st)
            check_gating_parity(spark, st)
            full = time_full_query(spark, sf_dir)
            fixture = time_core(spark, st, production=False)
            production = time_core(spark, st, production=True)
            wall = time_production_wall(spark, st)
            rows.append((label, full, fixture, production, wall))
            print(
                f"{label}: full-query(fixture)={full:.2f}s "
                f"core-fixture={fixture:.2f}s core-production={production:.2f}s "
                f"production-wall(gating+core)={wall:.2f}s "
                f"(injection saves {fixture - production:.2f}s, "
                f"{(1 - production / fixture) * 100:.0f}% of the core)"
            )
        print("\n| scale | full q220 fixture | core, recompute | core, injected "
              "frozen state | gating+core, all injected (production wall) |")
        print("|---|---|---|---|---|")
        for label, full, fixture, production, wall in rows:
            print(
                f"| {label} | {full:.2f}s | {fixture:.2f}s | {production:.2f}s "
                f"| {wall:.2f}s |"
            )
        return 0
    finally:
        shutil.rmtree(stage, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
