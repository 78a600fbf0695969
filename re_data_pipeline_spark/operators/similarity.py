"""Similarity search over embedding columns (SURVEY §2.6 W4 + north-star ANN).

The reference's vector search is Pinecone ``index.query(top_k, filter=...)``
(``transcripts_to_vector_db.py:303-313``, k=23 at
``transcript_summaries.py:271-274``).  Here the index is a DataFrame of
``array<float>`` and search is relational:

- **Brute-force top-k** — exact baseline: map-only cosine scoring against a
  broadcast query vector, then a global top-k.  Spark plans ``orderBy(desc)
  .limit(k)`` as per-partition partial top-k + single-reduce TakeOrdered —
  no full sort, no full shuffle; scales linearly with corpus size.
- **Metadata-filtered top-k** — the Pinecone filter is just a WHERE pushed
  below the scoring projection (and into the parquet scan).
- **LSH-bucketed ANN** — scale path: sign-random-projection bucket key (md5-
  derived hyperplanes, engine-portable), equi-join query buckets to corpus
  buckets, exact re-rank inside buckets only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from re_data_pipeline_spark.functions.vectors import cosine_similarity, literal_vector


def _orderable(dt) -> bool:
    """True iff Spark can sort on a column of this type.

    MapType is unorderable (AnalysisException in ORDER BY); arrays and
    structs are orderable iff every element/field is.  Everything atomic
    (including binary) sorts fine.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def _tiebreak_cols(df: DataFrame, exclude: tuple[str, ...]) -> list[str]:
    """Deterministic-tiebreak column list: every column not in ``exclude``
    whose type is orderable.  Used by every top-k in this module so rank
    windows / TakeOrdered are stable across partitionings whenever the
    remaining columns jointly identify a row (the r13 first-column-only
    heuristic silently lost that guarantee on non-unique first columns;
    the r14 fix extends the full-column rule to the per-query and PQ
    paths and skips map-typed metadata, which Spark cannot sort on)."""
    return [
        f.name
        for f in df.schema.fields
        if f.name not in exclude and _orderable(f.dataType)
    ]


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int,
    vec_col: str = "embedding",
    where: Column | None = None,
    score_col: str = "score",
) -> DataFrame:
    """Exact top-k by cosine similarity to one query vector.

    Deterministic tiebreak: (score desc, then every ORDERABLE non-vector
    column asc) so results are stable across partitionings whenever rows
    are unique — the old first-column-only heuristic silently lost the
    guarantee when the first non-vector column was non-unique (or
    absent), and ivf_topk/ann_lsh_topk inherited the instability (r13
    fix); map-typed metadata is skipped because Spark cannot sort on it
    (r14 fix).
    """
    q = literal_vector(query_vec)
    scored = df.withColumn(score_col, cosine_similarity(F.col(vec_col), q))
    if where is not None:
        scored = scored.where(where)
    tiebreak = _tiebreak_cols(df, (vec_col,))
    return scored.orderBy(F.desc(score_col), *tiebreak).limit(k)


def cosine_topk_per_query(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_vec: str = "embedding",
    query_vec: str = "embedding",
    query_id: str = "query_id",
    score_col: str = "score",
    prefilter: Column | None = None,
) -> DataFrame:
    """Top-k per query via broadcast(queries) × corpus + rank window.

    The window partitions by query, so the shuffle key is the query id — the
    corpus itself is scored map-side against the broadcast query table.
    Non-vector query columns (metadata epochs…) pass through.  ``prefilter``
    (a predicate over corpus × query columns) restricts candidates BEFORE
    the rank — metadata-filtered retrieval semantics (Pinecone filters the
    index, then takes top-k); filtering after the rank would hand each
    query a slice of the global top-k instead.
    """
    qcols = [c for c in queries.columns if c != query_vec]
    shared = set(corpus.columns) & set(qcols)
    if shared:
        raise ValueError(
            f"corpus and queries share column names {sorted(shared)} — "
            "rename the query-side columns before calling (the cross join "
            "would make window/tiebreak references ambiguous)"
        )
    joined = corpus.crossJoin(
        F.broadcast(queries.select(*qcols, F.col(query_vec).alias("__qv")))
    )
    if prefilter is not None:
        joined = joined.where(prefilter)
    scored = joined.withColumn(score_col, cosine_similarity(F.col(corpus_vec), F.col("__qv"))).drop("__qv")
    tiebreak = _tiebreak_cols(corpus, (corpus_vec,))
    w = Window.partitionBy(query_id).orderBy(F.desc(score_col), *tiebreak)
    return scored.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k).drop("__rn")


def srp_bucket(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket key: one bit per hyperplane.

    Hyperplane coefficients are supplied by the caller (derive them from any
    deterministic source); the bucket key is a small integer — an equi-join
    key that turns ANN into a hash join.
    """
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    key = F.lit(0)
    for i, plane in enumerate(planes):
        p = literal_vector(plane)
        d = F.aggregate(
            F.zip_with(c, p, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        key = key + F.when(d >= 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return key


def ivf_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int,
    n_lists: int = 8,
    n_probe: int = 2,
    vec_col: str = "embedding",
    list_col: str | None = None,
    score_col: str = "score",
) -> DataFrame:
    """IVF-style ANN: partition the corpus into inverted lists, search only
    the ``n_probe`` lists whose centroids are nearest the query.

    List assignment: if ``list_col`` is given it is used as the inverted-list
    id (the production path — assign at ingest, partition the table by it so
    a query prunes partitions).  Otherwise lists are bootstrapped here from
    an SRP bucket of ``ceil(log2 n_lists)`` hyperplanes (deterministic seed
    pattern), which approximates a coarse k-means in one pass.

    Plan shape: centroids = one groupBy(list) avg per dimension (posexplode
    + two aggs); probe selection is driver-side over ≤n_lists rows; the
    probed scan is a partition-prunable filter + exact cosine rerank.
    """
    import math

    dim = len(query_vec)
    if list_col is None:
        n_planes = max(1, math.ceil(math.log2(n_lists)))
        planes = [
            [1.0 if ((i * 11 + j * 17) % 7) < 3 else -1.0 for j in range(dim)]
            for i in range(n_planes)
        ]
        corpus = corpus.withColumn("__list", srp_bucket(vec_col, planes))
        list_col = "__list"

    # per-list centroids: explode to (list, pos, v) → avg → re-assemble
    exploded = corpus.select(F.col(list_col).alias("__l"), F.posexplode(vec_col).alias("pos", "v"))
    cent_rows = (
        exploded.groupBy("__l", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("cv"))
        .groupBy("__l")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("vals"))
        .select("__l", F.transform("vals", lambda s: s["cv"]).alias("centroid"))
        .collect()
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else -1.0

    # Row attribute access rejects __-prefixed names; use indexing
    # list-id tiebreak: cent_rows comes from collect() (nondeterministic
    # order), so equal-cosine centroids at the n_probe boundary would
    # otherwise make successive runs probe DIFFERENT lists (r13 fix)
    probes = sorted(
        cent_rows, key=lambda r: (-cos(list(r["centroid"]), query_vec), r["__l"])
    )[:n_probe]
    probe_ids = [r["__l"] for r in probes]

    probed = corpus.where(F.col(list_col).isin(probe_ids))
    out = cosine_topk(probed.drop("__list") if list_col == "__list" else probed,
                      query_vec, k, vec_col, score_col=score_col)
    return out


def ann_lsh_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int,
    planes: list[list[float]],
    vec_col: str = "embedding",
    score_col: str = "score",
) -> DataFrame:
    """Approximate top-k: score only the corpus rows in the query's SRP bucket.

    At 100 TB the bucket column is computed at ingest and the table is
    partitioned by it, so a query reads one partition (partition pruning)
    instead of scanning the corpus.
    """
    import math

    qkey = 0
    for i, plane in enumerate(planes):
        d = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
        if d >= 0:
            qkey += 2 ** i
    bucketed = corpus.withColumn("__bucket", srp_bucket(vec_col, planes))
    return cosine_topk(
        bucketed.where(F.col("__bucket") == F.lit(qkey)).drop("__bucket"),
        query_vec,
        k,
        vec_col,
        score_col=score_col,
    )


def ann_topk_per_query(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    planes: list[list[float]],
    corpus_vec: str = "embedding",
    query_vec: str = "embedding",
    query_id: str = "query_id",
    score_col: str = "score",
    prefilter: Column | None = None,
    probe_bits: int = 1,
) -> DataFrame:
    """Approximate per-query top-k: SRP-bucket BOTH sides, equi-join on the
    bucket key, exact cosine re-rank inside each query's bucket only.

    This is the scale form of ``cosine_topk_per_query``: instead of scoring
    |corpus| × |queries| rows, each query scores only its bucket's corpus
    slice (expected |corpus| / 2^planes).  At 100 TB the corpus bucket key
    is computed at ingest and the table is partitioned by it, so the join
    prunes partitions.  Same output schema as the exact operator; recall is
    governed by the plane count (fewer planes → bigger buckets → higher
    recall, more compute) and by ``probe_bits`` — standard multi-probe LSH:
    each query also probes the buckets within that Hamming distance of its
    own (0 = own bucket only; 1 = own + one-bit flips, +|planes| probe
    rows per query, still broadcast-small), rescuing vectors that fall just
    across one hyperplane.
    """
    qcols = [c for c in queries.columns if c != query_vec]
    shared = set(corpus.columns) & set(qcols)
    if shared:
        raise ValueError(
            f"corpus and queries share column names {sorted(shared)} — "
            "rename the query-side columns before calling"
        )
    bucketed = corpus.withColumn("__bucket", srp_bucket(corpus_vec, planes))
    qb = srp_bucket(query_vec, planes)
    probes = [qb]
    if probe_bits >= 1:
        probes += [qb.bitwiseXOR(F.lit(2 ** i)) for i in range(len(planes))]
    if probe_bits >= 2:
        probes += [
            qb.bitwiseXOR(F.lit(2 ** i + 2 ** j))
            for i in range(len(planes))
            for j in range(i + 1, len(planes))
        ]
    q = queries.select(
        *qcols,
        F.col(query_vec).alias("__qv"),
        F.explode(F.array_distinct(F.array(*probes))).alias("__bucket"),
    )
    joined = bucketed.join(F.broadcast(q), "__bucket")
    if prefilter is not None:
        joined = joined.where(prefilter)
    scored = joined.withColumn(
        score_col, cosine_similarity(F.col(corpus_vec), F.col("__qv"))
    ).drop("__qv", "__bucket")
    tiebreak = _tiebreak_cols(corpus, (corpus_vec,))
    w = Window.partitionBy(query_id).orderBy(F.desc(score_col), *tiebreak)
    return scored.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k).drop("__rn")


def kmeans_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    list_col: str = "list_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2, ties → lowest
    centroid index).

    Centroids ride along as literals (k × dim doubles ≪ broadcast
    threshold), so assignment is a map-only projection — no shuffle, no UDF:
    one flat fold expression per centroid over the materialized vector
    column (HOF perf rule: never nest transform over sequence).
    """
    c = F.col(vec_col)
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(c, literal_vector(cent), lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for cent in centroids
        ]
    )
    return corpus.withColumn("__d", dists).withColumn(
        list_col, (F.array_position(F.col("__d"), F.array_min("__d")) - 1).cast("int")
    ).drop("__d")


def kmeans_lists(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    list_col: str = "list_id",
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means over an embedding column — the learned-centroid path
    for IVF inverted lists (vs. the one-pass SRP bootstrap in ``ivf_topk``).

    Iteration shape (the only scalable one): centroids live on the driver
    (k × dim, a few KB) and are folded into the plan as literals; each Lloyd
    step is one map-only assignment pass + one (list, dim-position) hash
    aggregate — per iteration the cluster exchanges exactly k × dim doubles,
    never the corpus.  Deterministic init: the k lowest-``id_col`` vectors.
    Empty clusters keep their previous centroid.

    Returns (assigned corpus DataFrame, final centroids).
    """
    init = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(v) for v in r[0]] for r in init]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = kmeans_assign(corpus, centroids, vec_col, list_col)
        rows = (
            assigned.select(list_col, F.posexplode(vec_col).alias("pos", "v"))
            .groupBy(list_col, "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new = [list(cent) for cent in centroids]
        for r in rows:
            new[r[list_col]][r["pos"]] = float(r["m"])
        centroids = new
    return kmeans_assign(corpus, centroids, vec_col, list_col), centroids


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split each vector into ``m``
    subvectors and k-means each subspace independently — but run ALL
    subspaces' Lloyd steps in the same two jobs per iteration (one map-only
    assignment projection with m argmin expressions, one
    (subspace, code, position) aggregate), so training cost is independent
    of ``m``.  Codebooks live on the driver (m × k × dim/m doubles, a few
    KB).  Deterministic init: subvectors of the k lowest-id vectors.

    Returns ``codebooks[sub][code] -> centroid`` (python lists).
    """
    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("pq_train needs a non-empty corpus")
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"embedding dim {dim} is not divisible by m={m} — "
                         "the trailing dims would be silently dropped")
    d_sub = dim // m
    init = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(init) < k:
        # argmin_code indexes books[s][c] for every c in range(k); fewer
        # init rows than codes would IndexError at plan-build time with no
        # hint at the cause (r13 fix) — and a codebook with duplicate or
        # missing codes is statistically useless anyway
        raise ValueError(
            f"pq_train needs at least k={k} vectors to seed the codebooks; "
            f"corpus has {len(init)}"
        )
    books = [
        [[float(v) for v in r[0][s * d_sub : (s + 1) * d_sub]] for r in init]
        for s in range(m)
    ]

    def sub_col(s: int):
        return F.slice(F.col(vec_col), s * d_sub + 1, d_sub)

    def argmin_code(s: int):
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        sub_col(s),
                        literal_vector(books[s][c]),
                        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in range(k)
            ]
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    for _ in range(iters):
        assigned = corpus.select(
            *[
                F.struct(
                    F.lit(s).alias("sub"),
                    argmin_code(s).alias("code"),
                    sub_col(s).alias("subvec"),
                ).alias(f"__a{s}")
                for s in range(m)
            ]
        )
        rows = (
            assigned.select(F.explode(F.array(*[F.col(f"__a{s}") for s in range(m)])).alias("a"))
            .select("a.sub", "a.code", F.posexplode("a.subvec").alias("pos", "v"))
            .groupBy("sub", "code", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("mean"))
            .collect()
        )
        new = [[list(c) for c in book] for book in books]
        for r in rows:
            new[r["sub"]][r["code"]][r["pos"]] = float(r["mean"])
        books = new
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Encode vectors to ``m`` byte-sized codes (argmin centroid per
    subspace) — 64 floats become 8 ints; the index shrinks ~32× and the
    original vector column can be dropped from the hot path."""
    m = len(codebooks)
    k = len(codebooks[0])
    d_sub = len(codebooks[0][0])

    def code(s: int):
        sub = F.slice(F.col(vec_col), s * d_sub + 1, d_sub)
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        sub,
                        literal_vector(codebooks[s][c]),
                        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in range(k)
            ]
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return corpus.withColumn(code_col, F.array(*[code(s) for s in range(m)]))


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    topk: int,
    code_col: str = "pq_codes",
    score_col: str = "adc_dist",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: precompute the
    query→centroid distance table per subspace on the driver (m × k
    doubles), then scoring a vector is ``m`` table lookups — no float
    vector is read at query time.  Map-only + TakeOrdered, like the exact
    path but over a 32× smaller index.
    """
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    lut = [
        [
            sum(
                (query_vec[s * d_sub + j] - cent[j]) ** 2
                for j in range(d_sub)
            )
            for cent in codebooks[s]
        ]
        for s in range(m)
    ]
    # ONE SQL parse for the m×k literal table instead of m·k+m py4j
    # Column calls (k=256 codebooks made this ~2,000 driver round trips
    # per query construction — r19, the literal_vector precedent)
    from re_data_pipeline_spark.functions.vectors import _literal_vector_sql

    rows_sql = [_literal_vector_sql([float(v) for v in row]) for row in lut]
    if all(r is not None for r in rows_sql):
        lut_col = F.expr("array(" + ", ".join(rows_sql) + ")")
    else:
        lut_col = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    encoded = encoded.withColumn("__lut", lut_col)
    dist = None
    for s in range(m):
        term = F.element_at(F.element_at("__lut", s + 1), F.element_at(code_col, s + 1) + 1)
        dist = term if dist is None else dist + term
    tiebreak = _tiebreak_cols(encoded, (code_col, "__lut"))
    return (
        encoded.withColumn(score_col, dist)
        .drop("__lut")
        .orderBy(F.asc(score_col), *tiebreak)
        .limit(topk)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of retrieval result lists — the standard
    hybrid-search combiner (lexical BM25 + dense ANN, or any N rankers):
    score(d) = Σ_lists 1/(k + rank_list(d)), k=60 per Cormack et al.
    Robust to incomparable score scales because only RANKS enter.

    Each input frame must carry ``(id_col, rank)`` with rank ≥ 1 — the
    top-N output of a retriever, so inputs are candidate-list-sized, not
    corpus-sized.  Contributions are fixed-pointed to integer NANO units
    (round(1e9/(k+rank)) — IEEE division then half-up rounding, identical
    in any engine) and summed as integers, so fusion order and float
    accumulation can never flip a result; ties break on the id.  A
    document absent from a list contributes 0 for it (union semantics —
    no outer-join NULL handling to get wrong).

    Returns ``(id, rrf_nano, rrf, n_lists, rnk)`` for the global top
    ``top_n``.

    Input hygiene: a doc_id repeated WITHIN one ranking frame counts once,
    at its best (minimum) rank — a per-list min-rank dedup runs before the
    union, so a sloppy retriever can't inflate ``rrf_nano``/``n_lists``
    by emitting a document twice.  Ranks must be ≥ 1 (rank 0 would score
    above any legal rank); violations raise at materialization via an
    ``assert_true`` guard embedded in the scoring expression — no extra
    validation job over the (possibly expensive) retriever lineage.

    Scale note: the fusion input is Σ|lists| rows (bounded by retriever
    top-Ns); the only ordering is a TakeOrdered top-n over that bounded
    set — fusing is never a corpus-scale operation.
    """
    if not rankings:
        raise ValueError("rrf_fuse: rankings must be non-empty")
    # assert_true returns NULL when the predicate holds (and raises when it
    # doesn't), so coalescing its long-cast into the rank is a no-op that
    # keeps the check lazy and inside the same projection
    rank_checked = F.col("rank") + F.coalesce(
        F.assert_true(F.col("rank") >= 1, F.lit("rrf_fuse: rank must be ≥ 1")).cast(
            "long"
        ),
        F.lit(0),
    )
    tagged = [
        r.select(F.col(id_col), rank_checked.alias("__r"))
        .groupBy(id_col)
        .agg(F.min("__r").alias("__r"))
        .select(
            F.col(id_col),
            F.round(F.lit(float(10**9)) / (F.lit(k) + F.col("__r")), 0)
            .cast("long")
            .alias("__c"),
        )
        for r in rankings
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    fused = u.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("rrf_nano"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    out = fused.orderBy(F.desc("rrf_nano"), F.asc(id_col)).limit(top_n)
    # bounded-global-window: ranks the .limit(top_n) fused list only
    w = Window.orderBy(F.desc("rrf_nano"), F.asc(id_col))
    return out.withColumn("rnk", F.row_number().over(w).cast("int")).select(
        id_col,
        "rrf_nano",
        F.round(F.col("rrf_nano") / 1e9, 6).alias("rrf"),
        "n_lists",
        "rnk",
    )


def ann_recall_report(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Measured recall@k of SRP-bucket ANN against the exact cosine top-k
    for a bounded query set — the vector-side "measure, don't guess"
    audit (the ANN sibling of ``dedup.lsh_recall_report``): before a
    corpus-scale run trusts a plane count, read the recall it actually
    delivers on sampled queries.  Self-matches are excluded from both
    tiers.

    Returns ``(query_id, k, n_exact, n_approx, n_hit, recall)`` per
    query — ``recall = n_hit / k`` (a query whose bucket holds fewer
    than ``k`` candidates caps its own recall, which is exactly the
    signal: add plane sets or widen probes).

    Scale shape: queries broadcast against the corpus (|q|·n scored rows
    for the EXACT tier — this is an EVAL operator over a sampled query
    set, not a serving path); per-query ranks are windows partitioned by
    query id over that bounded product; the approx tier scores only
    same-bucket candidates.  Every ranking tiebreaks on the id, and both
    engines fold the cosine left-to-right, so ranks replay bit-stably.
    """
    from re_data_pipeline_spark.functions.vectors import cosine_similarity

    q = queries.select(
        F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qv")
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("__cos"), F.asc(id_col))

    scored = (
        corpus.select(id_col, vec_col)
        .crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("__qid"))
        .withColumn("__cos", cosine_similarity(F.col(vec_col), F.col("__qv")))
    )
    exact = scored.withColumn("__rk", F.row_number().over(w)).where(
        F.col("__rk") <= k
    ).select("__qid", id_col)

    bucketed = corpus.select(
        id_col, vec_col, srp_bucket(F.col(vec_col), planes).alias("__b")
    )
    qb = q.withColumn("__b", srp_bucket(F.col("__qv"), planes))
    approx = (
        bucketed.join(F.broadcast(qb), "__b")
        .where(F.col(id_col) != F.col("__qid"))
        .withColumn("__cos", cosine_similarity(F.col(vec_col), F.col("__qv")))
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select("__qid", id_col)
    )
    hits = exact.join(approx, ["__qid", id_col]).groupBy("__qid").agg(
        F.count(F.lit(1)).alias("__hit")
    )
    n_ap = approx.groupBy("__qid").agg(F.count(F.lit(1)).alias("__nap"))
    return (
        q.select("__qid")
        .join(hits, "__qid", "left")
        .join(n_ap, "__qid", "left")
        .select(
            F.col("__qid").alias("query_id"),
            F.lit(k).cast("int").alias("k"),
            F.lit(k).cast("bigint").alias("n_exact"),
            F.coalesce("__nap", F.lit(0)).cast("bigint").alias("n_approx"),
            F.coalesce("__hit", F.lit(0)).cast("bigint").alias("n_hit"),
            F.round(F.coalesce("__hit", F.lit(0)) / F.lit(float(k)), 6).alias(
                "recall"
            ),
        )
    )
