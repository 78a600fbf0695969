"""Vector math over ``array<float>`` embedding columns (SURVEY §2.6 W4, §2.10 X5).

The reference stores 1536-dim embeddings in Pinecone and queries cosine top-k
(``transcripts_to_vector_db.py:246-252``).  Here embeddings are a plain
``array<float>`` column and similarity is a JVM-side higher-order-function
expression — ``zip_with`` + ``aggregate`` — i.e. no UDF, no Python, fully
codegen'd, and embarrassingly parallel over partitions.

Accumulation is left-to-right in double precision, which both Spark and the
DuckDB oracle (``list_cosine_similarity``) perform identically, making scores
bit-comparable after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns (double)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is 0 (``try_divide`` —
    ANSI mode is on by default in Spark 4, so a plain ``/`` would throw
    DIVIDE_BY_ZERO on zero vectors)."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def _literal_vector_sql(vals: list[float]) -> str | None:
    """``array(...)`` SQL text for a finite double vector, or None when a
    value has no SQL double literal (NaN/±inf) and the caller must fall
    back to the Column path.  ``repr`` of a Python float is the shortest
    round-tripping decimal and Java's ``Double.parseDouble`` is correctly
    rounded, so the parsed literal is bit-identical to ``F.lit(v)``."""
    import math

    if all(math.isfinite(v) for v in vals):
        return "array(" + ", ".join(repr(v) + "D" for v in vals) + ")"
    return None


def literal_vector(vec: list[float]) -> Column:
    """A broadcast-able literal query vector (array<double>).

    Built as ONE SQL parse instead of dim+1 Column calls: per-element
    ``F.lit`` costs one py4j round trip each, which multiplied across
    iterative callers (k-center rounds, k-means centroids, PQ codebooks)
    is pure driver time at any data scale (measured r19: ~1 ms/element).
    The parsed tree is the same CreateArray-of-double-Literals."""
    vals = [float(v) for v in vec]
    sql = _literal_vector_sql(vals)
    if sql is not None:
        return F.expr(sql)
    return F.array(*[F.lit(v) for v in vals])


def micro_sq_dist(vec_col: Column | str, center_vec: list[float]) -> Column:
    """Squared Euclidean distance to a driver-literal center as an INTEGER
    micro-distance (×1e6, HALF_UP) — the cross-engine-exact form shared by
    k-center selection (``operators/selection.kcenter_select``) and the D4
    nearest-center assignment stage (q215), replaying bit-for-bit in the
    DuckDB oracle's ordered ``list_reduce`` fold.  The fold order and the
    rounding live HERE and only here: a second copy that drifts breaks the
    bit-exactness contract between the selection and assignment stages.

    When ``vec_col`` is a plain column name the whole expression is ONE
    SQL parse (the same tree the Column form builds — verified by the
    kcenter/q215 parity oracle) instead of ~25 py4j round trips; k-round
    callers rebuild it per round, so the construction cost multiplies."""
    vals = [float(v) for v in center_vec]
    arr = _literal_vector_sql(vals)
    if isinstance(vec_col, str) and vec_col.isidentifier() and arr is not None:
        return F.expr(
            f"CAST(round(aggregate(zip_with({vec_col}, {arr}, "
            f"(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
            f"0.0D, (a, b) -> a + b) * 1000000.0D, 0) AS BIGINT)"
        )
    terms = F.zip_with(
        _c(vec_col),
        literal_vector(vals),
        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
    )
    return F.round(
        F.aggregate(terms, F.lit(0.0), lambda a, b: a + b) * 1e6, 0
    ).cast("long")
