"""Data-quality expectation gates — declarative row-level rules evaluated
in one pass, with a violation report per rule.

The reference validates ad-hoc inside each task (key-presence checks,
try/except casts, invalid-coordinate drops).  This operator centralizes the
pattern: rules are named boolean Column expressions; one aggregate pass
computes violation counts (no per-rule scans), and callers choose gate
semantics (fail the job, quarantine rows, or just report).

Scale shape: the report is ``len(rules)`` columns of conditional counts in a
single partial-aggregating pass over the table — at 100 TB the report costs
one scan.  ``split_valid`` returns two LAZY filters over the input — each
half's materialization is its own scan, so a caller writing both halves
should persist the input (or write once and split downstream) if two full
corpus scans are unacceptable; the operator does not cache on the caller's
behalf (a silent 100 TB persist would thrash executor storage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One-pass violation report: ``rule | n_rows | n_violations | rate``.

    A rule PASSES for a row when its Column is true; nulls count as
    violations (null-hostile by design — an unknown is not a pass).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        # coalesce: SUM over an EMPTY table is NULL, and an empty table is
        # vacuously clean (0 violations), not a crash
        F.coalesce(
            F.sum(F.when(cond.isNull() | ~cond, 1).otherwise(0)), F.lit(0)
        ).alias(f"__v_{name}")
        for name, cond in rules.items()
    ]
    # Collect the 1-row aggregate ONCE and unpivot driver-side: the
    # previous union-of-per-rule-selects planned the corpus agg once per
    # rule (Catalyst doesn't reuse it across union branches), breaking the
    # module's one-scan contract len(rules)-fold (r14 fix, the
    # weighted_quantiles pattern).  The rate division/rounding stays in
    # Spark so HALF_UP matches the SQL oracle bit-for-bit.
    row = df.agg(*aggs).first()
    spec = df.sparkSession.createDataFrame(
        [(name, int(row["n_rows"]), int(row[f"__v_{name}"])) for name in rules],
        "rule string, n_rows bigint, n_violations bigint",
    )
    return spec.select(
        "rule",
        "n_rows",
        "n_violations",
        F.when(
            F.col("n_rows") > 0,
            F.round(F.col("n_violations") / F.col("n_rows"), 6),
        ).otherwise(F.lit(0.0)).alias("violation_rate"),
    )


def enforce(
    df: DataFrame, rules: dict[str, Column], max_violation_rate: float = 0.0
) -> DataFrame:
    """Gate: raise if any rule's violation rate exceeds the budget.

    Returns ``df`` unchanged on success so the gate composes inside a
    pipeline (`... |> enforce |> write`).
    """
    report = check(df, rules).collect()
    # compare raw counts: the report's rate is rounded for display, and a
    # zero-tolerance gate must not pass 1-in-10M violations that round to 0.0
    bad = [
        r
        for r in report
        if r["n_violations"] > r["n_rows"] * max_violation_rate
    ]
    if bad:
        detail = ", ".join(f"{r['rule']}={r['n_violations']}/{r['n_rows']}" for r in bad)
        raise ValueError(f"quality gate failed: {detail}")
    return df


def split_valid(df: DataFrame, rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """Quarantine split: (rows passing ALL rules, rows failing any)."""
    all_pass = F.lit(True)
    for cond in rules.values():
        all_pass = all_pass & F.coalesce(cond, F.lit(False))
    return df.where(all_pass), df.where(~all_pass)


def char_entropy(
    df, text_col: str = "text", id_col: str = "doc_id", out_col: str = "entropy"
):
    """Per-document character Shannon entropy in nats — the classic
    cheap gibberish/boilerplate gate (near-zero entropy = repeated filler,
    ≥ ~4.2 nats over ASCII text = keyboard mash / base64 blobs; natural
    prose sits ~2.5-3.2).  Complements the char-bigram LM
    (``selection.char_bigram_nll``): entropy needs NO trained model, so it
    runs in the very first scan pass of a new crawl.

    MAP-ONLY: the per-doc character histogram is higher-order-function
    algebra over the char array — ``aggregate(distinct_chars, Σ term)``
    with ``count(c) = size(filter(chars, x -> x = c))`` — so scoring
    100 TB is one scan with zero shuffles (O(|doc|·|alphabet|) comparisons
    per row inside codegen; alphabets are small).  The char array and its
    distinct form are MATERIALIZED columns first: Spark has no
    common-subexpression elimination inside HOF lambdas, so inlining
    either would re-split the text once per distinct character.

    Exactness: each character's −(c/n)·ln(c/n) term is fixed-pointed to
    integer MICRO-nats before the HOF integer sum — partition-order- and
    engine-independent.  Returns ``(id_col, n_chars, entropy_micro,
    entropy)``; empty/null text yields NULLs.
    """

    d = df.withColumn("__chars", F.split(F.col(text_col), "")).withColumn(
        "__dc", F.array_distinct(F.col("__chars"))
    )
    # counts materialized as their own ARRAY column: the entropy term
    # reads each count twice (p and ln p), and a filter() recomputed per
    # read would scan the char array 2·|alphabet| times per row
    d = d.withColumn(
        "__cnt",
        F.transform(
            "__dc", lambda c: F.size(F.filter("__chars", lambda x: x == c))
        ),
    )
    # n from length(), not size(__chars): split("", "") yields [""] (one
    # artifact element), so an empty doc would otherwise count 1 char
    n = F.length(F.col(text_col))
    micro = F.aggregate(
        "__cnt",
        F.lit(0).cast("long"),
        lambda acc, cnt: acc
        + F.round(-(cnt / n) * F.log(cnt / n) * 1_000_000, 0).cast("long"),
    )
    return d.select(
        F.col(id_col),
        n.cast("bigint").alias("n_chars"),
        F.when(n > 0, micro).alias("entropy_micro"),
        F.when(n > 0, F.round(micro / 1e6, 6)).alias(out_col),
    )


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The Gopher rule-pack (Rae et al. 2021, §A1.1) as one map-only pass —
    the standard pre-filter battery large curation efforts run before any
    model-based scoring.  Emits per-document booleans for each rule plus
    the conjunction:

    - ``ok_word_count``: 50 ≤ words ≤ 100 000
    - ``ok_mean_word_len``: mean word length in [3, 10]
    - ``ok_symbol_ratio``: (# + …) symbols ≤ 0.1 per word
    - ``ok_bullet_lines``: ≤ 90% of lines start with a bullet
    - ``ok_ellipsis_lines``: ≤ 30% of lines end with …/...
    - ``ok_alpha_words``: ≥ 80% of words contain a letter
    - ``ok_stopwords``: ≥ 2 distinct stopwords from the 8-word Gopher set
    - ``keep`` = all of the above

    Every ratio compares in INTEGER cross-multiplied form
    (``Σlen ≥ 3·words`` etc.) — float thresholds straddle representation
    boundaries differently per engine; integers cannot.  Token and line
    arrays are materialized columns (HOF lambdas have no common-
    subexpression elimination).  Scale shape: pure column algebra — the
    whole battery runs inside the scan pass, before any shuffle.
    """
    d = (
        df.withColumn("__w", F.split(F.trim(F.col(text_col)), r"\s+"))
        .withColumn("__l", F.split(F.col(text_col), r"\n"))
        # lowered tokens materialized ONCE: the stopword filter lambda
        # referenced transform(__w, lower) inline, re-lowering the whole
        # token array once per stopword — 8x per row (r13 fix)
        .withColumn("__wl", F.transform("__w", F.lower))
    )
    words = F.size("__w")
    lines = F.size("__l")
    sum_len = F.aggregate(
        "__w", F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    symbols = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"[#…]", ""))
    )
    bullet_lines = F.size(
        F.filter("__l", lambda x: F.trim(x).rlike(r"^[•\-\*▪]"))
    )
    ellipsis_lines = F.size(
        F.filter("__l", lambda x: F.rtrim(x).rlike(r"(…|\.\.\.)$"))
    )
    alpha_words = F.size(F.filter("__w", lambda w: w.rlike("[A-Za-z]")))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
            lambda s: F.array_contains(F.col("__wl"), s),
        )
    )
    flags = {
        "ok_word_count": (words >= 50) & (words <= 100_000),
        "ok_mean_word_len": (sum_len >= 3 * words) & (sum_len <= 10 * words),
        "ok_symbol_ratio": symbols * 10 <= words,
        "ok_bullet_lines": bullet_lines * 10 <= lines * 9,
        "ok_ellipsis_lines": ellipsis_lines * 10 <= lines * 3,
        "ok_alpha_words": alpha_words * 10 >= words * 8,
        "ok_stopwords": stop_hits >= 2,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else keep & c
    return d.select(
        F.col(id_col),
        words.cast("bigint").alias("n_words"),
        *[c.alias(n) for n, c in flags.items()],
        keep.alias("keep"),
    )
