"""Unigram-LM (SentencePiece-style) tokenizer training conformance:
operators/unigram.py vs a pure-Python exhaustive reference (enumerate ALL
segmentations, min by (cost, seg) — the same spec the DuckDB oracle
replays recursively)."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from re_data_pipeline_spark.operators.unigram import (
    unigram_lm_train,
    unigram_word_fertility,
)


def _micro(x: float) -> int:
    # HALF_UP like Spark F.round / DuckDB round (not Python banker's)
    return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))


def _ref_words(texts, max_word_len=12):
    import re

    words = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", (t or "").lower()):
            if 1 <= len(w) <= max_word_len:
                words[w] += 1
    return words


def _ref_costs(counts: dict[str, int]) -> dict[str, int]:
    t = sum(counts.values())
    return {p: _micro(-math.log(c / t) * 1e6) for p, c in counts.items()}


def _ref_segment(w: str, costs: dict[str, int], max_piece_len: int):
    """Exhaustive min over ALL segmentations by (total_cost, seg_string)."""
    best = None
    stack = [(0, 0, "")]
    while stack:
        j, c, s = stack.pop()
        if j == len(w):
            key = (c, s)
            if best is None or key < best:
                best = key
            continue
        for L in range(1, min(max_piece_len, len(w) - j) + 1):
            p = w[j : j + L]
            if p in costs:
                stack.append((j + L, c + costs[p], s + (" " if s else "") + p))
    return best


def _ref_unigram_train(texts, num_iters=2, max_word_len=12, max_piece_len=4,
                       seed_multi=64, target_vocab=None):
    words = _ref_words(texts, max_word_len)
    cand = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for L in range(1, min(max_piece_len, len(w) - i) + 1):
                cand[w[i : i + L]] += f
    chars = {p: c for p, c in cand.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_multi]
    counts = dict(chars) | dict(multi)
    costs = _ref_costs(counts)
    for _ in range(num_iters):
        cnt = Counter()
        for w, f in words.items():
            _, s = _ref_segment(w, costs, max_piece_len)
            for p in s.split(" "):
                cnt[p] += f
        counts = {p: cnt.get(p, 0) + 1 for p in costs if len(p) == 1}
        new_multi = {p: c for p, c in cnt.items() if len(p) >= 2}
        if target_vocab is not None:
            budget = max(target_vocab - len(chars), 0)
            new_multi = dict(sorted(
                new_multi.items(), key=lambda pc: (-pc[1], pc[0])
            )[:budget])
        counts |= new_multi
        costs = _ref_costs(counts)
    return counts, costs


TEXTS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "cats eat rats",
    "the matter of the cat",
]


def test_unigram_train_matches_exhaustive_reference(spark):
    d = spark.createDataFrame(list(enumerate(TEXTS)), "doc_id long, text string")
    got = {
        r["piece"]: (r["count"], r["cost_micro"])
        for r in unigram_lm_train(d, num_iters=2, seed_multi=8).collect()
    }
    counts, costs = _ref_unigram_train(TEXTS, num_iters=2, seed_multi=8)
    assert got == {p: (counts[p], costs[p]) for p in counts}


def test_unigram_train_partitioning_invariant(spark):
    d = spark.createDataFrame(list(enumerate(TEXTS)), "doc_id long, text string")
    a = sorted(map(tuple, unigram_lm_train(d, seed_multi=8).collect()))
    b = sorted(
        map(tuple, unigram_lm_train(d.repartition(7, "text"), seed_multi=8).collect())
    )
    assert a == b


def test_unigram_fertility_matches_reference(spark):
    d = spark.createDataFrame(list(enumerate(TEXTS)), "doc_id long, text string")
    vocab = unigram_lm_train(d, num_iters=2, seed_multi=8)
    got = {r["w"]: r["n_pieces"] for r in unigram_word_fertility(d, vocab).collect()}
    counts, costs = _ref_unigram_train(TEXTS, num_iters=2, seed_multi=8)
    for w in _ref_words(TEXTS):
        _, s = _ref_segment(w, costs, 4)
        assert got[w] == len(s.split(" ")), w


def test_unigram_char_coverage_survives_iterations(spark):
    # every corpus char must stay segmentable after any number of M-steps
    d = spark.createDataFrame([(1, "abc xyz q")], "doc_id long, text string")
    v = unigram_lm_train(d, num_iters=3, seed_multi=2)
    pieces = {r["piece"] for r in v.collect()}
    assert {"a", "b", "c", "x", "y", "z", "q"} <= pieces


def test_unigram_target_vocab_prunes_to_size(spark):
    """SentencePiece's vocab-size knob: only the highest-count multi-char
    pieces survive to the target; chars never prune; costs re-normalize
    over the survivors.  Verified against the extended reference."""
    d = spark.createDataFrame(list(enumerate(TEXTS)), "doc_id long, text string")
    n_chars = len({c for t in TEXTS for c in t if c.isalnum()})
    target = n_chars + 2
    got = {
        r["piece"]: (r["count"], r["cost_micro"])
        for r in unigram_lm_train(
            d, num_iters=2, seed_multi=8, target_vocab=target
        ).collect()
    }
    assert len(got) <= target
    assert sum(1 for p in got if len(p) >= 2) <= 2
    counts, costs = _ref_unigram_train(
        TEXTS, num_iters=2, seed_multi=8, target_vocab=target
    )
    assert got == {p: (counts[p], costs[p]) for p in counts}
    # a target below the alphabet yields the all-chars vocabulary
    chars_only = unigram_lm_train(d, num_iters=1, seed_multi=8, target_vocab=1)
    assert all(len(r["piece"]) == 1 for r in chars_only.collect())


def test_unigram_fertility_total_on_out_of_alphabet_words(spark):
    """r12 self-review: scoring a DIFFERENT corpus than the vocab was
    trained on used to crash (ANSI element_at on the empty candidate
    array) or silently drop words sharing no piece with the vocab
    (inner join).  Unsegmentable words must surface as NULL n_pieces."""
    train = spark.createDataFrame([(1, "aa bb ab")], "doc_id long, text string")
    vocab = unigram_lm_train(train, num_iters=1, seed_multi=4)
    other = spark.createDataFrame(
        # 'aa' segmentable; 'cc' fully out-of-alphabet; 'a9' partially
        # ('9' unseen — no full segmentation exists)
        [(2, "aa cc a9")], "doc_id long, text string"
    )
    got = {r["w"]: r["n_pieces"] for r in unigram_word_fertility(other, vocab).collect()}
    assert set(got) == {"aa", "cc", "a9"}
    # this tiny fixture prunes every multi-char piece in the M-step
    # (all Viterbi-zero), so 'aa' encodes as two single-char pieces
    assert got["aa"] == 2
    assert got["cc"] is None
    assert got["a9"] is None


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abz", min_size=1, max_size=8), min_size=1, max_size=6
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_unigram_train_property(spark, texts):
    d = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["piece"]: (r["count"], r["cost_micro"])
        for r in unigram_lm_train(d, num_iters=2, max_piece_len=3,
                                  seed_multi=5).collect()
    }
    counts, costs = _ref_unigram_train(texts, num_iters=2, max_piece_len=3,
                                       seed_multi=5)
    assert got == {p: (counts[p], costs[p]) for p in counts}, texts
