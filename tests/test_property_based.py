"""Property-based conformance (SURVEY §5 item 4): the Spark expressions for
safe_cast and the sale_or_lease CASE chain must agree with direct Python
transcriptions of the reference logic on arbitrary inputs.

Each hypothesis example is a BATCH of strings evaluated in one DataFrame
(one Spark job per example, not per string)."""

from hypothesis import given, settings, strategies as st

from re_data_pipeline_spark.functions.cleaning import (
    normalize_sale_or_lease,
    safe_cast,
)


def ref_sale_or_lease(v):
    """Python transcription of combine_broker_listings.py:78-94."""
    if v is None:
        return ""
    low = v.lower()
    if "sale" in low and "lease" in low:
        return "sale_or_lease"
    if "sale" in low:
        return "sale"
    if "sublease" in low:
        return "sublease"
    if "lease" in low:
        return "lease"
    return v


text_strategy = st.one_of(
    st.none(),
    st.text(max_size=30),
    st.sampled_from(
        ["For Sale", "for LEASE", "Sublease", "sale or lease", "SALE/SUBLEASE", "x"]
    ),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=40))
def test_sale_or_lease_matches_reference(spark, batch):
    df = spark.createDataFrame([(v,) for v in batch], "v string").select(
        normalize_sale_or_lease("v").alias("out")
    )
    got = [r.out for r in df.collect()]
    assert got == [ref_sale_or_lease(v) for v in batch]


import re as _re

# Python float() accepts "nan"/"inf"/"infinity" case-insensitively, underscore
# digit separators ("1_0"), and non-ASCII unicode digits; the engine's strict
# ASCII guard intentionally treats those as un-castable — documented platform
# differences, not safe_cast properties, so exclude them from the oracle.
_NANINF = _re.compile(r"^\s*[+-]?(nan|inf\w*)\s*$", _re.IGNORECASE)
_PLATFORM_ONLY = _re.compile(r"_|[^\x00-\x7f]")

num_strategy = st.one_of(
    st.none(),
    st.text(max_size=12).filter(
        lambda s: not _NANINF.match(s) and not _PLATFORM_ONLY.search(s)
    ),
    st.integers(-10**6, 10**6).map(str),
    st.floats(allow_nan=False, allow_infinity=False, width=32).map(lambda f: f"{f:.4f}"),
    # the falsifying family from round 2: Java typed-literal suffixes that
    # Python float() rejects but a bare Spark try_cast accepts
    st.sampled_from(["1D", "1F", "2d", "3.5f", "0x1A", "1e3D", " 7L ", "8s"]),
)


def ref_safe_double(v, default=0.0):
    if v is None:
        return default
    try:
        return float(v)
    except (TypeError, ValueError):
        return default


@settings(max_examples=25, deadline=None)
@given(st.lists(num_strategy, min_size=1, max_size=40))
def test_safe_cast_double_matches_python(spark, batch):
    df = spark.createDataFrame([(v,) for v in batch], "v string").select(
        safe_cast("v", "double", 0.0).alias("out")
    )
    got = [r.out for r in df.collect()]
    want = [ref_safe_double(v) for v in batch]
    for g, w in zip(got, want):
        assert g == w or abs(g - w) < 1e-9, (g, w, batch)


# ---------------------------------------------------------------------------
# Round-6 operators: BPE fold and 2-D Pareto frontier vs Python references
# ---------------------------------------------------------------------------

def ref_bpe_merge(toks, left, right):
    """Greedy leftmost non-overlapping merge, direct transcription."""
    out = []
    for t in toks:
        if out and out[-1] == left and t == right:
            out[-1] = left + right
        else:
            out.append(t)
    return out


tok_strategy = st.lists(st.sampled_from(["a", "b", "c", "ab", "ba"]), min_size=1, max_size=12)


@settings(max_examples=8, deadline=None)
@given(st.lists(tok_strategy, min_size=1, max_size=20),
       st.sampled_from([("a", "b"), ("a", "a"), ("b", "a"), ("ab", "a")]))
def test_bpe_fold_matches_reference(spark, token_lists, merge):
    from pyspark.sql import functions as F

    from re_data_pipeline_spark.operators.bpe import _apply_merge

    left, right = merge
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(token_lists)], "id long, toks array<string>"
    )
    got = {r.id: r.m for r in df.select(
        "id", _apply_merge(F.col("toks"), left, right).alias("m")).collect()}
    for i, toks in enumerate(token_lists):
        assert got[i] == ref_bpe_merge(toks, left, right), (toks, merge)


@settings(max_examples=6, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=60,
    unique=True,
))
def test_pareto_frontier_matches_bruteforce_property(spark, pts):
    from re_data_pipeline_spark.operators.frontier import pareto_frontier_2d

    rows = [(i, float(c), float(d)) for i, (c, d) in enumerate(pts)]
    df = spark.createDataFrame(rows, "k long, cost double, delay double")
    got = sorted(r.k for r in
                 pareto_frontier_2d(df, "cost", "delay", "k", num_partitions=3).collect())
    # brute force; the strategy generates unique (cost, delay) pairs, so
    # the operator's coincident-point caveat doesn't apply and the result
    # must match exactly (no duplicate emission, no misses)
    idx = list(range(len(pts)))
    want = sorted(
        i for i in idx
        if not any(
            (pts[j][0] <= pts[i][0] and pts[j][1] <= pts[i][1]
             and (pts[j][0] < pts[i][0] or pts[j][1] < pts[i][1]))
            for j in idx
        )
    )
    assert got == want, (pts, got, want)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=7),
)
def test_snake_shards_balance_property(spark, sizes, n_shards):
    """For arbitrary size multisets: every row lands on exactly one shard
    in [0, S); shard totals differ by at most the largest item."""
    from re_data_pipeline_spark.operators.selection import snake_shards

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "doc_id long, n long"
    )
    rows = snake_shards(df, "n", n_shards, order_tiebreak=["doc_id"]).collect()
    assert len(rows) == len(sizes)
    assert {r.shard for r in rows} <= set(range(n_shards))
    totals = [0] * n_shards
    for r in rows:
        totals[r.shard] += r.n
    assert max(totals) - min(totals) <= max(sizes)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=11), min_size=3, max_size=10
        ).map(lambda ws: " ".join(f"t{w}" for w in ws)),
        min_size=2,
        max_size=12,
    )
)
def test_containment_prefix_rule_no_false_negatives(spark, texts):
    """For arbitrary small corpora, the prefix-filtered containment join
    must find EXACTLY the brute-force best containers (the containment
    prefix rule has zero false negatives)."""
    from re_data_pipeline_spark.operators.dedup import containment_best

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: (r.container_id, r.containment)
           for r in containment_best(df, threshold_num=7, threshold_den=10).collect()}

    sets = {i: set(t.split()) for i, t in enumerate(texts)}
    expect = {}
    for a in sets:
        best = None
        for b in sets:
            if a == b:
                continue
            c = len(sets[a] & sets[b])
            if c * 10 >= 7 * len(sets[a]):
                key = (-c, b)
                if best is None or key < best:
                    best = key
        if best is not None:
            c, b = -best[0], best[1]
            expect[a] = (b, round(c / len(sets[a]), 6))
    assert got == expect


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=12),
    st.integers(min_value=1, max_value=10**6),
)
def test_temperature_quotas_exact_sum_and_monotone(spark, sizes, budget):
    """Σ quota == budget exactly for arbitrary inputs, and a domain with a
    strictly larger size never receives a smaller quota (pairwise
    monotonicity of largest-remainder over monotone weights)."""
    from re_data_pipeline_spark.operators.selection import temperature_quotas

    rows = [(f"d{i:02d}", s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "domain string, n bigint")
    out = {r.domain: r for r in temperature_quotas(df, "domain", "n", budget).collect()}
    assert sum(r.quota for r in out.values()) == budget
    for da, sa in rows:
        for db, sb in rows:
            if sa > sb:
                assert out[da].quota >= out[db].quota, (da, db)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(-100, 100)),
        min_size=1,
        max_size=60,
    ),
    st.integers(2, 7),
)
def test_prefix_sums_match_sequential_property(spark, rows, nparts):
    """assign_prefix_sums over arbitrary (key, value) batches must equal
    the sequential scan of the sorted list, for any partition count."""
    from re_data_pipeline_spark.operators.ids import assign_prefix_sums, release_spines

    data = [(k, i, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, id long, v long")
    out = assign_prefix_sums(
        df, ["k", "id"], "v", out_col="cum", ordinal_col="o", num_partitions=nparts
    )
    got = sorted(out.collect(), key=lambda r: (r.k, r.id))
    run, expect = 0, []
    for k, i, v in sorted(data):
        run += v
        expect.append(run)
    assert [r.cum for r in got] == expect
    assert [r.o for r in got] == list(range(len(data)))
    release_spines(out)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=60),
    st.sampled_from([(1, 100), (1, 4), (1, 2), (3, 4), (9, 10), (1, 1)]),
)
def test_exact_quantiles_nearest_rank_property(spark, vals, q):
    """exact_quantiles must pick sorted[⌈q·n⌉−1] for arbitrary multisets
    (duplicates included) and any single quantile."""
    import math

    from re_data_pipeline_spark.operators.ids import exact_quantiles, release_spines

    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v long, id long"
    )
    out = exact_quantiles(df, ["v", "id"], "v", quantiles=[q])
    got = out.collect()[0].value
    s = sorted(vals)
    assert got == s[math.ceil(q[0] * len(s) / q[1]) - 1]
    release_spines(out)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.text(alphabet="abcxy ", min_size=0, max_size=40), min_size=1, max_size=20))
def test_char_entropy_matches_python_property(spark, texts):
    """char_entropy micro-nats equal the Python Counter transcription for
    arbitrary strings over a small alphabet (incl. empty strings)."""
    import math
    from collections import Counter

    from re_data_pipeline_spark.operators.quality import char_entropy

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.entropy_micro for r in char_entropy(df).collect()}
    for i, t in enumerate(texts):
        if len(t) == 0:
            assert got[i] is None
        else:
            n = len(t)
            truth = sum(
                round(-(c / n) * math.log(c / n) * 1e6)
                for c in Counter(t).values()
            )
            assert got[i] == truth, (i, t)


def _ref_stupid_backoff(train_docs, score_docs):
    """Pure-Python replica of operators/lm.ngram_lm_nll's fixed-point
    Stupid-Backoff semantics (float ops in the same shapes)."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    def _micro(x):
        # Spark F.round / DuckDB round are HALF_UP; Python round() is
        # banker's — a micro-nat landing exactly on .5 would flake
        # against a correct engine (r11 advice; test_lm.py already does
        # this for the 6dp nll).
        return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))

    uni, bi, tri = Counter(), Counter(), Counter()
    for toks in train_docs:
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
        tri.update(zip(toks, toks[1:], toks[2:]))
    n_tok = sum(uni.values())
    v = len(uni)
    out = {}
    for i, toks in enumerate(score_docs):
        if len(toks) < 3:
            out[i] = (0, None)
            continue
        total = 0
        for p in range(len(toks) - 2):
            w1, w2, w3 = toks[p], toks[p + 1], toks[p + 2]
            if (w1, w2, w3) in tri:
                f = _micro(-math.log(tri[(w1, w2, w3)] / bi[(w1, w2)]) * 1e6)
            elif (w2, w3) in bi:
                f = _micro(-math.log(0.4 * (bi[(w2, w3)] / uni[w2])) * 1e6)
            elif w3 in uni:
                f = _micro(-math.log(0.16 * ((uni[w3] + 1) / (n_tok + v))) * 1e6)
            else:
                f = _micro(-math.log(0.16 * (1 / (n_tok + v))) * 1e6)
            total += f
        out[i] = (len(toks) - 2, total)
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "z"]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
)
def test_ngram_lm_matches_python_reference(spark, train_lists, score_lists):
    """All four backoff tiers (trigram / bigram / unigram / unseen floor)
    must match a direct Python transcription on arbitrary tiny corpora —
    'z' never trains, so the floor tier is exercised."""
    from hypothesis import assume

    from re_data_pipeline_spark.operators.lm import ngram_lm_nll

    # an LM trained on zero tokens is documented-degenerate (all-NULL nll)
    assume(any(train_lists))

    train = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(train_lists)],
        "doc_id bigint, text string",
    )
    score = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(score_lists)],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["nll_micro"])
        for r in ngram_lm_nll(train, score).collect()
    }
    want = _ref_stupid_backoff(train_lists, score_lists)
    assert got == want


def _ref_multi_source_dijkstra(edges, sources):
    """Driver-side multi-source Dijkstra (non-negative integer weights):
    the independent truth for sssp_distances' frontier-limited
    Bellman-Ford — different algorithm, same answer."""
    import heapq
    from collections import defaultdict

    adj = defaultdict(list)
    for s, d, w in edges:
        adj[s].append((d, w))
    dist = {}
    heap = [(0, n) for n in set(sources)]
    heapq.heapify(heap)
    while heap:
        du, u = heapq.heappop(heap)
        if u in dist:
            continue
        dist[u] = du
        for v, w in adj[u]:
            if v not in dist:
                heapq.heappush(heap, (du + w, v))
    return dist


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=0,
        max_size=16,
    ),
    st.sets(st.integers(min_value=0, max_value=7), min_size=1, max_size=3),
)
def test_sssp_matches_dijkstra_property(spark, edges, sources):
    """sssp_distances (frontier-limited Bellman-Ford) equals a driver-side
    multi-source Dijkstra on arbitrary small digraphs — duplicate edges,
    self-loops, zero-weight edges/cycles, unreachable nodes, and sources
    with no out-edges all included by generation."""
    from re_data_pipeline_spark.operators.graph import sssp_distances

    e = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
    s = spark.createDataFrame([(n,) for n in sources], "node bigint")
    got = {r["node"]: r["dist"] for r in sssp_distances(e, s).collect()}
    assert got == _ref_multi_source_dijkstra(edges, sources)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 9)),  # (value, weight)
        min_size=1,
        max_size=50,
    ),
    st.sampled_from([(1, 2), (3, 4), (9, 10), (1, 1)]),
)
def test_weighted_quantiles_reach_property(spark, rows, q):
    """weighted_quantiles must return the FIRST row (in sort order) whose
    cumulative weight reaches q·W, for arbitrary weights including zeros —
    checked against the sequential scan (r14: the spec is now built from
    one collected aggregate; this pins the semantics through that path)."""
    from re_data_pipeline_spark.operators.ids import release_spines, weighted_quantiles

    data = [(v, w, i) for i, (v, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "v long, w long, id long")
    out = weighted_quantiles(df, ["v", "id"], "w", "v", quantiles=[q])
    got = out.collect()
    W = sum(w for _, w, _ in data)
    run, want = 0, None
    for v, w, _ in sorted(data, key=lambda t: (t[0], t[2])):
        run += w
        if run * q[1] >= q[0] * W:
            want = v
            break
    if W == 0:
        # all-zero weights: the first row already "reaches" 0 = q*W
        want = sorted(data, key=lambda t: (t[0], t[2]))[0][0]
    assert [r.value for r in got] == [want]
    release_spines(out)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),  # (group, value)
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([(1, 2), (9, 10), (1, 4)]),
)
def test_grouped_exact_quantiles_property(spark, rows, q):
    """grouped_exact_quantiles must equal the per-group nearest-rank pick
    for arbitrary group/value multisets (r14: the spec is now one exploded
    literal array; this pins the semantics through that path)."""
    import math
    from collections import defaultdict

    from re_data_pipeline_spark.operators.ids import (
        grouped_exact_quantiles,
        release_spines,
    )

    data = [(g, v, i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "g int, v long, id long")
    out = grouped_exact_quantiles(df, ["g"], ["v", "id"], "v", quantiles=[q])
    got = {(r.g, r.q_num, r.q_den): r.value for r in out.collect()}
    by_g = defaultdict(list)
    for g, v, _ in data:
        by_g[g].append(v)
    want = {
        (g, q[0], q[1]): sorted(vs)[math.ceil(q[0] * len(vs) / q[1]) - 1]
        for g, vs in by_g.items()
    }
    assert got == want
    release_spines(out)


# --- receipt algebra laws (r17): fold/unfold over arbitrary corpora ------

_doc_strategy = st.tuples(
    st.integers(min_value=-(2**40), max_value=2**40),
    st.one_of(st.none(), st.text(max_size=20)),
    st.one_of(st.none(), st.sampled_from(["en", "de", ""])),
)


@st.composite
def _corpus_with_subset(draw):
    docs = draw(
        st.lists(_doc_strategy, min_size=1, max_size=20, unique_by=lambda d: d[0])
    )
    mask = draw(st.lists(st.booleans(), min_size=len(docs), max_size=len(docs)))
    return docs, mask


@settings(max_examples=6, deadline=None)
@given(_corpus_with_subset())
def test_manifest_retract_law_on_arbitrary_corpora(spark, case):
    """Group law on arbitrary data (NULL text/lang, empty strings,
    negative and huge ids): un-folding ANY subset D's manifest out of
    A's receipt equals the from-scratch receipt of A∖D on the invertible
    columns — the q221 identity, free of fixture shape."""
    from re_data_pipeline_spark.operators.maintenance import (
        retract_shard_manifest,
        shard_manifest,
    )

    docs, mask = case
    a = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    d_rows = [doc for doc, m in zip(docs, mask) if m]
    keep_rows = [doc for doc, m in zip(docs, mask) if not m]
    cols = ("shard", "n_rows", "content_xor", "n_bytes")
    m_a = shard_manifest(a, "doc_id", ["text", "lang"], num_shards=4)
    if d_rows:
        d = spark.createDataFrame(d_rows, "doc_id long, text string, lang string")
        m_d = shard_manifest(d, "doc_id", ["text", "lang"], num_shards=4)
        got_df = retract_shard_manifest(m_a, m_d)
    else:
        got_df = m_a
    got = {tuple(r[c] for c in cols) for r in got_df.collect()}
    if keep_rows:
        keep = spark.createDataFrame(
            keep_rows, "doc_id long, text string, lang string"
        )
        exp = {
            tuple(r[c] for c in cols)
            for r in shard_manifest(keep, "doc_id", ["text", "lang"], num_shards=4).collect()
        }
    else:
        exp = set()
    assert got == exp


@st.composite
def _two_corpus_versions(draw):
    docs = draw(
        st.lists(_doc_strategy, min_size=1, max_size=15, unique_by=lambda d: d[0])
    )
    actions = draw(
        st.lists(
            st.sampled_from(["keep", "drop", "mut_text", "mut_lang"]),
            min_size=len(docs),
            max_size=len(docs),
        )
    )
    base_ids = {d[0] for d in docs}
    added = [
        d
        for d in draw(
            st.lists(_doc_strategy, max_size=5, unique_by=lambda d: d[0])
        )
        if d[0] not in base_ids
    ]
    return docs, actions, added


@settings(max_examples=6, deadline=None)
@given(_two_corpus_versions())
def test_receipt_diff_law_on_arbitrary_corpora(spark, case):
    """Diff law on arbitrary data (NULL text/lang, empty strings,
    negative and huge ids): corpus_receipt_diff's receipt-localized,
    shard-pruned deltas equal the brute-force row classification — the
    q222 identity, free of fixture shape.  Mutations are constructed to
    change the CANONICAL (NULL-as-'') form, matching the receipt
    family's documented convention."""
    from re_data_pipeline_spark.operators.maintenance import corpus_receipt_diff

    docs, actions, added = case
    b_rows, want = [], {}

    def shard(doc_id):
        import hashlib

        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 4

    for (doc_id, text, lang), act in zip(docs, actions):
        if act == "drop":
            want[doc_id] = (shard(doc_id), "removed")
        elif act == "mut_text":
            b_rows.append((doc_id, (text or "") + "X", lang))
            want[doc_id] = (shard(doc_id), "mutated")
        elif act == "mut_lang":
            b_rows.append((doc_id, text, "zz"))
            want[doc_id] = (shard(doc_id), "mutated")
        else:
            b_rows.append((doc_id, text, lang))
    for doc_id, text, lang in added:
        b_rows.append((doc_id, text, lang))
        want[doc_id] = (shard(doc_id), "added")

    schema = "doc_id long, text string, lang string"
    a = spark.createDataFrame(docs, schema)
    b = (
        spark.createDataFrame(b_rows, schema)
        if b_rows
        else spark.createDataFrame([], schema)
    )
    r = corpus_receipt_diff(a, b, num_shards=4)
    got = {row["doc_id"]: (row["shard"], row["delta"]) for row in r["deltas"].collect()}
    assert got == want
    # localization invariant: every divergent shard manifest_diff flags
    # is a shard some delta lives in, and vice versa
    flagged = {row["shard"] for row in r["shards"].collect()}
    assert flagged == {s for s, _ in want.values()}
