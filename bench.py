"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "total_headline_sec", "value": N, "unit": "sec",
   "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1}

Each query is fully executed via the `noop` sink (computes everything,
writes nothing — no driver collect bottleneck, no result materialization
skew), which is how you'd benchmark a cluster job.

Per-query time is the min of three executions (steady state): the first run
of an expression-heavy plan pays Janino/whole-stage-codegen compilation
(seconds of single-threaded JVM work that a long-lived cluster session
amortizes away and that varies with host load); later runs measure the
actual data-path cost, and min-of-3 absorbs host-load spikes that round-2
showed can swing an unchanged plan by 1.7×.  Both runs recompute from the
parquet scan — nothing is cached between them (`noop` materializes no
result and no .persist() is involved).

Each query also records a PLAN HASH (md5 of the formatted physical plan
with exec-ids/locations/codegen-stage numbers normalized out): if a later
round's timing moves but the plan hash is unchanged, the delta is host
noise, not a plan regression — attributable mechanically, no wall-of-text
diffing.  Before printing, the hashes are DIFFED against the most recent
recorded round (highest BENCH_r*.json in the repo root): every changed
hash emits a `plan-change` warning line on stderr, so an unintended plan
regression (a lost broadcast, a new shuffle, a pushdown that stopped
firing) is flagged the moment it appears instead of surfacing as an
unexplained timing drift a round later.  Intentional changes are expected
to arrive with a commit that explains them.  Set SPARK_GRAFT_BENCH_RUNS
to override the run count.
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
    # round-2 heavy extensions: keep the dedup/text path visible so a
    # regression in candidate generation / verification / packing shows up
    "q71_near_dedup_pipeline",   # LSH candidates → Jaccard verify → anti-join
    "q82_connected_components",  # iterative min-label propagation
    "q97_sequence_packing",      # recursive packing window
    "q107_incremental_dedup",    # batch-vs-index LSH dedup
    "q119_multipolygon_zones",   # PIP join with holes (bbox + ray cast)
    # round-5 operators: keep the curation/maintenance family visible
    "q128_keep_best_dedup",      # CC spine + quality argmax window
    "q130_bloom_prefilter",      # bloom-routed incremental anti-join
    "q132_bpe_pair_counts",      # word-table-first tokenizer pass
    "q135_inverted_index",       # df + capped postings build
    "q136_pagerank",             # fixed-point iterative propagation
    # round-6 additions: the distributed skyline, the exact
    # set-similarity join, and the BPE trainer — keep them visible
    "q152_skyline",              # range-partitioned frontier scan
    "q153_prefix_filter_join",   # prefix-indexed exact Jaccard join
    "q161_bpe_train",            # iterative tokenizer merge loop
    # round-7 additions: binary-code ANN, distributed shard packing, and
    # the containment join (the heaviest of the new curation family)
    "q167_simhash_radius",       # pigeonhole band join + popcount verify
    "q168_snake_shards",         # global ordinals + snake arithmetic
    "q169_containment_best",     # prefix-filtered containment + verify
    # round-8 additions: the prefix-sum spine (Arrow scan), the vocab
    # coverage curve riding it, and the signature-estimate join
    "q175_global_cumsum",        # range exchange + map-only Arrow scan
    "q176_vocab_coverage",       # prefix-sum spine over the vocab table
    "q178_minhash_estimate",     # persisted signatures + lane-agreement join
    # round-10 additions: the ExactSubstr tier (winnowed anchor join +
    # token-verified extension) and the iterative classifier trainer
    "q197_exact_substring_dedup",  # winnowing anchors → verify/extend → rewrite
    "q200_exact_substring_grams",  # same semantics, guaranteed-linear all-grams
    "q198_classifier_train",     # 2 aggregates/iteration logistic GD
    "q201_intra_substring_dedup",  # map-only within-doc span rewrite
    # round-11 additions: the word-trigram LM (3 gram aggs + 3-tier
    # coalesce join — the heaviest new op) and its per-language cut
    "q202_ngram_lm_nll",         # Stupid-Backoff model build + score
    "q203_ccnet_buckets",        # LM + ordinal-spine tertile cut
    # round-12 additions: the pruned clean-reference LM deployment and
    # the unigram tokenizer trainer (EM loop → multi-job, plan hash n/a)
    "q210_ngram_lm_pruned",      # head-bounded model tables, split train/score
    "q211_unigram_train",        # Viterbi hard-EM over the word table
    "q213_kcenter_select",       # farthest-point greedy, k 1-row argmaxes
    # round-13 additions: coreset-scale k-center (65 argmax rounds on the
    # persisted-min-dist route — wall is k×job-overhead-bound locally) and
    # the composed D4 pipeline (SemDeDup → k-center → diversity keep)
    "q214_kcenter_incremental",  # persisted __md, checkpoint every 32 rounds
    "q215_d4_curation",          # semdedup → prototypes → keep-farthest-3/4
    # round-15 additions: the frozen-tokenizer regression gate (unigram
    # EM train on snapshot A + fertility/drift on B) and the composed
    # FineWeb-style trace (blocklist → Gopher → LM cut → ExactSubstr →
    # manifest, stage-boundary checkpoint between curation and spans)
    "q218_tokenizer_rot",        # A-trained vocab scored on both snapshots
    "q219_fineweb_trace",        # 5-tier curation composition, one action
    # round-16 addition: the incremental crawl-update trace (q219's tiers
    # applied to the new batch only, frozen-A LM/threshold/index, A×B-only
    # span pass, manifest merge — the maintenance path of the recipe)
    "q220_incremental_crawl_update",  # frozen-corpus batch ingest + manifest fold
    # round-17 addition: q220's inverse — corpus retraction (broadcast id
    # fetch, manifest un-fold, broadcast index prune; the fixture's
    # index/manifest recompute is the only corpus-proportional wall)
    "q221_corpus_retraction",        # frozen-corpus delete + receipt un-fold
    # round-18 addition: the receipt audit completing the maintenance
    # triptych (append/retract/AUDIT) — manifest compare → literal-IN
    # shard prune on both scans → full-outer row-level delta over only
    # the divergent shards' rows
    "q222_corpus_receipt_diff",      # shard-localized corpus version diff
]


def normalize_plan_text(txt: str) -> str:
    """Strip everything that varies run-to-run / host-to-host without the
    plan SHAPE changing: plan/exec ids, codegen-stage numbers, file
    paths/sizes, statistics, RDD ids and their creation call sites."""
    txt = re.sub(r"#\d+", "#N", txt)                       # expression ids
    txt = re.sub(r"\[codegen id : \d+\]", "[codegen]", txt)
    txt = re.sub(r"\[plan_id=\d+\]", "[plan]", txt)
    # mask to END OF LINE: `Location: InMemoryFileIndex(1 paths)[file:/...]`
    # carries paths/counts after the first token, which round 4 proved leak
    # host state into the hash (identical code, three changed hashes)
    txt = re.sub(r"Location:.*", "Location: X", txt)
    # localCheckpoint / createDataFrame scans embed the JVM RDD id
    # (`MapPartitionsRDD[67] at localCheckpoint …`), which counts every RDD
    # ever created in the session — it varies with execution HISTORY, not
    # plan shape (the r4→r5 false hash drift on q82/q107/q119).  The
    # CREATION CALL SITE after it is history-dependent too: py4j reflective
    # calls inflate to `GeneratedMethodAccessorNN` after ~15 invocations,
    # so a LocalRelation hashed early in a session reads
    # `at applySchemaToPythonRDD at NativeMethodAccessorImpl.java:0` and
    # the same plan hashed late reads `…GeneratedMethodAccessorNN…` —
    # mask the whole callsite (r13: q213/q214 ad-hoc vs bench-sequence).
    txt = re.sub(r"RDD\[\d+\] at \S+ at \S+", "RDD[N] at X", txt)
    txt = re.sub(r"RDD\[\d+\]", "RDD[N]", txt)
    # higher-order-function lambda args are numbered by a session-global
    # counter (`lambda x_1` … `lambda x_19`) — same history dependence
    txt = re.sub(r"lambda ([a-z]+)_\d+", r"lambda \1_N", txt)
    txt = re.sub(r"file:/\S+", "file:/X", txt)             # any other path refs
    txt = re.sub(r"/tmp/\S+", "/tmp/X", txt)               # staged temp dirs
    txt = re.sub(r"Statistics\(.*?\)", "Statistics(X)", txt)
    # ordinal-spine base-offset maps are LAYOUT literals, not plan shape:
    # `element_at(map(keys: [partition ids], values: [cumulative counts]))`
    # embeds the persisted frame's per-partition row counts, which vary
    # with cache/session state while the RESULT is invariant (r13: q203
    # hashed differently across two builds in ONE fresh session; q215
    # differed across vantages).  Mask the whole literal-map payload —
    # a genuine plan regression always also changes surrounding operators.
    txt = re.sub(
        r"map\(keys: \[[^\]]*\], values: \[[^\]]*\]\)",
        "map(keys: X, values: X)",
        txt,
    )
    # AQE query-stage ids (`(37) BroadcastQueryStage … Arguments: 19`) are
    # assigned in MATERIALIZATION order — parallel broadcast stages race,
    # so identical plans number them differently run to run (r13: q203
    # flipped across two builds in one session).  Narrow mask: only the
    # Arguments line directly under a QueryStage header, so a genuine
    # bare-integer argument elsewhere (e.g. CollectLimit) stays visible.
    txt = re.sub(
        r"(QueryStage[^\n]*\nOutput[^\n]*\nArguments: )\d+", r"\1N", txt
    )
    return txt


def plan_hash(df) -> str:
    """md5 of the formatted physical plan after normalize_plan_text."""
    import hashlib

    txt = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    return hashlib.md5(normalize_plan_text(txt).encode("utf-8")).hexdigest()[:16]


def prior_plan_hashes(root: str | None = None) -> tuple[str, dict[str, str]]:
    """plan_hashes from the newest recorded round — the highest-numbered
    BENCH_r*.json (driver record) OR .benchmarks/bench_r*.json (the
    complete local record this tool writes), whichever round is newer.
    The driver stores the bench stdout as a TAIL string field, and from
    r13 on that tail truncates BEFORE plan_hashes — scanning only the
    driver records silently fell back to r12's hashes and emitted 21
    stale plan-change warnings per run (found r16).  The local records
    are full JSON, so the newest round always yields real hashes.
    Returns ("", {}) when no prior round (or no parseable hashes)
    exists.  ``root`` overrides the scan directory (unit tests build a
    synthetic record tree; the default is the repo root)."""
    import glob

    here = root or os.path.dirname(os.path.abspath(__file__))
    cands: list[tuple[int, int, str]] = []
    for pat, pref in (
        (os.path.join(here, "BENCH_r*.json"), 1),
        (os.path.join(here, ".benchmarks", "bench_r*.json"), 0),
    ):
        for f in glob.glob(pat):
            if m := re.search(r"r(\d+)\.json$", f):
                # driver record preferred on round ties (old behavior)
                cands.append((int(m.group(1)), pref, f))
    for _, _, path in sorted(cands, reverse=True):
        try:
            raw = open(path).read()
            i = raw.find("plan_hashes")
            if i < 0:
                continue
            j = raw.index("{", i)
            depth, k = 0, j
            while k < len(raw):
                if raw[k] in "{}":
                    depth += 1 if raw[k] == "{" else -1
                    if depth == 0:
                        break
                k += 1
            if k >= len(raw):
                continue  # truncated tail: unbalanced braces, try older file
            blob = raw[j : k + 1]
            # the driver's tail field stores the line re-escaped ("\"q01\"")
            if '\\"' in blob:
                blob = blob.replace('\\"', '"')
            return os.path.basename(path), json.loads(blob)
        except (ValueError, OSError, IndexError, json.JSONDecodeError):
            continue
    return "", {}


def initial_round_slot(filed_rounds: list[int]) -> int:
    """Default local-record slot: one past the newest driver-filed
    BENCH_rN.json, floored by DRIVER_WINDOW_ROUND.  The driver can skip a
    round (it filed no r10 records), so max(filed)+1 alone can point at the
    skipped round's slot and clobber its local record (r11 verdict task 2);
    the repo's own current-round stamp breaks that tie."""
    nxt = max(filed_rounds) + 1 if filed_rounds else 1
    try:
        from re_data_pipeline_spark.plans.queries import DRIVER_WINDOW_ROUND

        nxt = max(nxt, DRIVER_WINDOW_ROUND)
    except Exception:
        pass
    return nxt


def resolve_round_slot(bdir: str, nxt: int, payload_query_keys) -> tuple[int, str]:
    """First slot >= nxt whose local record is absent, unreadable, or holds
    the SAME query-key set as the new payload.  A differing key set means
    the existing file is a DIFFERENT round's bench — never overwrite it
    (bench_r10.json was lost exactly this way); slide forward instead."""
    want = set(payload_query_keys)
    while True:
        target = os.path.join(bdir, f"bench_r{nxt:02d}.json")
        if not os.path.exists(target):
            return nxt, target
        try:
            with open(target) as f:
                existing_keys = set(json.load(f).get("queries", {}))
        except Exception:
            # unreadable record: overwriting loses nothing parseable
            return nxt, target
        if existing_keys == want:
            return nxt, target
        print(
            f"bench_r{nxt:02d}.json holds a different query set; "
            "sliding to the next round slot",
            file=sys.stderr,
        )
        nxt += 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    if n_runs < 1:
        # 0 would leave every timing at float('inf'), and json.dumps
        # emits the non-standard token Infinity — an unparseable record
        # instead of a loud failure
        raise SystemExit(f"SPARK_GRAFT_BENCH_RUNS must be >= 1; got {n_runs}")

    from re_data_pipeline_spark.plans.queries import QUERIES
    from re_data_pipeline_spark.session import get_spark

    # Host load at run start (1/5/15-min): two same-code r12 records
    # differed 1.47x median on IDENTICAL plan hashes (builder vs loaded
    # judging host); recording it makes the noise band self-documenting
    # instead of re-derived every judging round (r12 verdict, next #8).
    loadavg = list(os.getloadavg())

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the smallest table so q01 isn't billed for it
    QUERIES["q01_pricing_summary"](spark, sf_dir).limit(1).collect()

    timings: dict[str, float] = {}
    plans: dict[str, str] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        # hash FIRST, on a cold catalog: hashing after the timed runs
        # raced the query's own spine-cache release (async unpersist) —
        # a still-registered InMemoryRelation flipped q203's hash once in
        # r12, firing a spurious plan-change warning
        from re_data_pipeline_spark.operators.ids import (
            release_local_checkpoint,
            release_spines,
        )

        try:
            probe = fn(spark, sf_dir)
            plans[name] = plan_hash(probe)
            # checkpoint-backed handles (pagerank's final round) survive
            # clearCache — release them explicitly on the discarded probe,
            # and the probe itself if it is a checkpoint scan (q59)
            release_spines(probe)
            release_local_checkpoint(probe)
        except Exception:
            plans[name] = "n/a"  # multi-job pipelines have no single plan
        best = float("inf")
        for _ in range(n_runs):
            # COLD-cache runs (r13 fix): guard-carrying operators
            # (q167/q178/q197/q214/...) pin a fingerprint/spine cache per
            # invocation with the release handle on the discarded result,
            # and the CacheManager serves a plan-identical rebuild from
            # that cache — clearing only BETWEEN queries (the old
            # protocol) made runs 2..n warm, so min-of-n recorded the
            # cached path and a regression in the cached stage was
            # invisible.  Clearing before EVERY run also keeps the
            # session flat between queries.
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            # untimed: checkpoint-backed handles survive clearCache, so a
            # checkpointing query would otherwise grow executor storage by
            # one pinned RDD per run for the session's lifetime (r14); the
            # discarded result frame itself may be a checkpoint scan too
            release_spines(df)
            release_local_checkpoint(df)
        timings[name] = round(best, 3)
        spark.catalog.clearCache()

    ref_file, prior = prior_plan_hashes()
    for name, h in plans.items():
        old = prior.get(name)
        if old and h != "n/a" and old != "n/a" and h != old:
            print(
                f"plan-change: {name} {old} -> {h} (vs {ref_file}) — "
                "verify intentional (new shuffle / lost broadcast / pushdown?)",
                file=sys.stderr,
            )

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "total_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "plan_hashes": plans,
        "runs_per_query": n_runs,
        "sf": sf,
        "loadavg_start": loadavg,
        # r1-r13 records took min-of-n with runs 2..n served from run 1's
        # pinned caches (warm); comparisons across the protocol change
        # should expect persist-carrying queries to read higher from r13
        "timing_protocol": "cold-cache-runs",
    }
    print(json.dumps(payload))
    # ALSO write the complete record locally: the driver stores only a
    # stdout TAIL, which truncated BENCH_r07's first seven headline rows
    # (r7 verdict, What's missing #2) — .benchmarks/bench_r<N>.json keeps
    # the repo's own full per-round record.  N: explicit SPARK_GRAFT_ROUND
    # env var wins; otherwise initial_round_slot() (max(BENCH_r*)+1 floored
    # by DRIVER_WINDOW_ROUND for driver-skipped rounds), EXCEPT when the
    # newest BENCH_rN carries the same plan hashes as this run (same code
    # state → a re-run of round N's bench after the driver filed it, so
    # overwrite bench_rN instead of polluting the N+1 slot — r8 advice);
    # resolve_round_slot() then refuses to overwrite any record holding a
    # different query-key set (the r10 record was lost to that in r11).
    try:
        import glob

        here = os.path.dirname(os.path.abspath(__file__))
        ns = [
            int(m.group(1))
            for f in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)", f))
        ]
        env_round = os.environ.get("SPARK_GRAFT_ROUND")
        if env_round:
            nxt = int(env_round)
        else:
            nxt = initial_round_slot(ns)
            try:
                # Same-round re-run detection.  BENCH_rN.json is a DRIVER
                # record (keys n/rc/cpus/sf/tail/parsed) whose bench payload
                # only exists as an escaped string inside "tail", so
                # json.load(...).get("plan_hashes") is always None and the
                # old equality could never fire (r9 advice).  Reuse
                # prior_plan_hashes(), which brace-parses the tail; the sf
                # cross-check uses the COMPLETE local record bench.py itself
                # wrote for that round (hash-identical plans at a different
                # sf are possible — Location/Statistics are masked).
                prior_name, prior_hashes = prior_plan_hashes()
                same_sf = True
                local_prev = os.path.join(
                    here, ".benchmarks", f"bench_r{max(ns):02d}.json"
                )
                if os.path.exists(local_prev):
                    with open(local_prev) as f:
                        same_sf = json.load(f).get("sf") == payload["sf"]
                if (
                    # only when the floor didn't advance the slot: a
                    # driver-skipped round with unchanged code would
                    # otherwise relabel THIS round's run as the old one
                    nxt == max(ns) + 1
                    # round-number match, not exact filename: the newest
                    # parseable hashes may come from the LOCAL record
                    # (bench_rN.json) when the driver tail truncates (r16)
                    and prior_name.lower().endswith(f"r{max(ns):02d}.json")
                    and prior_hashes
                    and prior_hashes == payload["plan_hashes"]
                    and same_sf
                ):
                    nxt = max(ns)
            except Exception:
                pass
        bdir = os.path.join(here, ".benchmarks")
        os.makedirs(bdir, exist_ok=True)
        nxt, target = resolve_round_slot(bdir, nxt, payload["queries"])
        with open(target, "w") as f:
            json.dump(payload, f, indent=1)
    except Exception as e:  # the record is best-effort; never fail the bench
        print(f"local bench record not written: {e}", file=sys.stderr)
    # Keep README's driver-window paragraph generated (r8 verdict: the
    # hand-written paragraph drifted two rounds running)
    try:
        from tools.gen_window_doc import main as _gen_window_doc

        _gen_window_doc()
    except Exception as e:
        print(f"window doc not regenerated: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
