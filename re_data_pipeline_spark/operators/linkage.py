"""Record linkage / entity resolution: blocking + weighted field agreement.

The reference's cross-source problem in relational form: the same real-
world entity arrives from multiple feeds with perturbed attributes (its
broker-listing merge keys on a curated uuid, ``combine_broker_listings.py:
111-157``; linkage is what produces such a key when none exists).  A
training-data pipeline needs the same operator to reconcile user/document
identities across sources before dedup or aggregation.

Classic two-stage shape (Fellegi–Sunter simplified to deterministic
integer weights):

1. **Blocking** — candidate pairs come from an EQUI-JOIN on coarse keys
   (region + segment, zip + name-prefix, …), never a cross join.  Recall
   is governed by the blocking key choice; everything outside a block is
   never compared, which is the scale lever (|pairs| = Σ block²  ≪  n²).
2. **Scoring** — each agreement rule contributes an integer weight;
   pairs at or above the threshold are links.  Integer weights keep the
   score exact and order-independent.

At 100 TB: the join shuffles on the blocking key (AQE splits hot blocks);
scores are map-side column algebra on the joined rows.  Skewed mega-
blocks (e.g. a default zip) should be salted or excluded — same guidance
as any hot join key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def record_linkage(
    a: DataFrame,
    b: DataFrame,
    block_on: list[tuple[str, str]],
    rules: list[tuple[Column, int]],
    threshold: int,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Links ``(id_a, id_b, score)`` with score ≥ threshold.

    ``block_on`` — [(a_col, b_col)] equality pairs forming the blocking
    join; ``rules`` — [(condition, weight)] over the joined row, each
    adding ``weight`` when the condition is true (NULL-safe: a NULL
    condition contributes 0).

    Both lists must be non-empty: an empty ``block_on`` would silently
    degenerate into the cross join this module's contract forbids, and an
    empty ``rules`` leaves no score to threshold — reject both loudly
    (same posture as ``salted_join``'s input validation).
    """
    if not block_on:
        raise ValueError(
            "record_linkage: block_on must be non-empty — an empty blocking "
            "key set means an all-pairs cross join, which this operator "
            "forbids by contract (|pairs| must be Σ block², not n²)"
        )
    if not rules:
        raise ValueError(
            "record_linkage: rules must be non-empty — no agreement rules "
            "means no score to compare against threshold"
        )
    cond = None
    for ca, cb in block_on:
        eq = a[ca] == b[cb]
        cond = eq if cond is None else (cond & eq)
    j = a.join(b, cond)
    score = None
    for rule, w in rules:
        term = F.when(rule, F.lit(w)).otherwise(F.lit(0))
        score = term if score is None else (score + term)
    return (
        j.select(a[id_a], b[id_b], score.cast("int").alias("score"))
        .where(F.col("score") >= threshold)
    )
