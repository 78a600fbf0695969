"""Batched LLM / embedding operator harness (SURVEY §2.10 X2-X6, §4 O4/O5/O7).

The reference calls OpenAI per row inside Airflow tasks (brochure extraction
``get_brochure_info.py:51-116``, REIT metric extraction
``REIT_metrics.py:177-290``, summarization ``transcript_summaries.py:124-253``,
embeddings ``transcripts_to_vector_db.py:275-301``) with hand-rolled batching
(100) and retry/backoff.  Here those become **mapInPandas operators** with a
pluggable client:

- Arrow-batched: the model client sees a whole pandas batch (vectorizable,
  amortized connection cost), sized by ``spark.sql.execution.arrow.
  maxRecordsPerBatch`` — the engine-level replacement for the reference's
  manual chunk sizes (O5).
- Deterministic by default: ``MockLLMClient`` / ``MockEmbeddingClient`` are
  pure hash functions, so pipelines are testable offline; a real client drops
  in per partition (one client per executor task, rate-limited there — the
  distributed analogue of the reference's 0.02 s sleep, O7).
- Cheap-filter-before-LLM (O4) is the caller's responsibility and preserved
  in the pipeline shapes: filters always precede ``llm_map`` because Catalyst
  will not reorder across an opaque pandas stage.
"""

from __future__ import annotations

import hashlib
import json
import math
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, FloatType, StringType, StructField, StructType


class MockLLMClient:
    """Deterministic stand-in for a chat/extract model: returns a JSON object
    derived from the prompt hash — stable across runs/engines, no network."""

    def complete_batch(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            h = hashlib.md5(p.encode("utf-8")).hexdigest()
            out.append(json.dumps({"summary": f"[MOCK:{h[:12]}]", "tokens": len(p.split())}))
        return out


class MockEmbeddingClient:
    """Deterministic hash embedding: dim floats in [-1, 1] from md5 of the
    text — the test stand-in for text-embedding-3-small
    (``transcripts_to_vector_db.py:275-278``)."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            vec = []
            for i in range(self.dim):
                h = hashlib.md5(f"{t}#{i}".encode("utf-8")).hexdigest()
                vec.append(int(h[:8], 16) / float(0xFFFFFFFF) * 2.0 - 1.0)
            n = math.sqrt(sum(v * v for v in vec)) or 1.0
            out.append([v / n for v in vec])
        return out


def _rate_limited_retrying(call_fn, limiter, max_attempts: int, retry_sleep=None):
    """Compose retry + rate limit so the token bucket gates EVERY attempt:
    an acquire outside the retry wrapper would let a 429-style error burst
    exceed the configured rate by up to max_attempts× (round-4 verdict #6).
    ``retry_sleep`` is the backoff sleep (injectable for tests; the limiter
    carries its own clock/sleep pair).
    """
    import time

    from re_data_pipeline_spark.sources.http import with_retries

    def attempt(ps):
        if limiter is not None:
            limiter.acquire()
        return call_fn(ps)

    return with_retries(
        attempt, max_attempts=max_attempts, sleep=retry_sleep or time.sleep
    )


def llm_map(
    df: DataFrame,
    prompt_col: str,
    out_col: str = "llm_output",
    client_factory: Callable[[], object] = MockLLMClient,
    batch_size: int = 100,
    requests_per_sec: float | None = None,
    max_attempts: int = 3,
) -> DataFrame:
    """Append an LLM completion column via mapInPandas.

    One client per task (created inside the iterator — never serialized from
    the driver); requests batched ``batch_size`` at a time within each Arrow
    batch, mirroring the reference's batch-of-100 pattern (O5).  Each model
    batch goes through exponential-backoff retries and, when
    ``requests_per_sec`` is set, a per-task token bucket (O7) — the
    distributed analogue of the reference's retry loop + fixed inter-call
    sleep (``get_edm_council_transcripts.py:200-249``,
    ``get_edm_building_permits.py:179``).
    """
    from re_data_pipeline_spark.sources.http import RateLimiter

    schema = StructType(df.schema.fields + [StructField(out_col, StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        limiter = RateLimiter(requests_per_sec) if requests_per_sec else None
        call = _rate_limited_retrying(
            lambda ps: client.complete_batch(ps["prompts"]), limiter, max_attempts
        )
        for pdf in batches:
            prompts = pdf[prompt_col].fillna("").tolist()
            outputs: list[str] = []
            for i in range(0, len(prompts), batch_size):
                outputs.extend(call({"prompts": prompts[i : i + batch_size]}))
            pdf = pdf.copy()
            pdf[out_col] = outputs
            yield pdf

    return df.mapInPandas(run, schema)


def embed_column(
    df: DataFrame,
    text_col: str,
    out_col: str = "embedding",
    dim: int = 16,
    client_factory: Callable[[], object] | None = None,
    batch_size: int = 100,
    requests_per_sec: float | None = None,
    max_attempts: int = 3,
) -> DataFrame:
    """Append an embedding column (X5) via mapInPandas, batched like the
    reference's embed-and-upsert batches of 100
    (``transcripts_to_vector_db.py:285-301``), with the same per-task
    retry/backoff + optional token-bucket rate limit as ``llm_map`` (O7)."""
    from re_data_pipeline_spark.sources.http import RateLimiter

    factory = client_factory or (lambda: MockEmbeddingClient(dim))
    schema = StructType(df.schema.fields + [StructField(out_col, ArrayType(FloatType()))])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = factory()
        limiter = RateLimiter(requests_per_sec) if requests_per_sec else None
        call = _rate_limited_retrying(
            lambda ps: client.embed_batch(ps["texts"]), limiter, max_attempts
        )
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            vecs: list[list[float]] = []
            for i in range(0, len(texts), batch_size):
                vecs.extend(call({"texts": texts[i : i + batch_size]}))
            pdf = pdf.copy()
            pdf[out_col] = vecs
            yield pdf

    return df.mapInPandas(run, schema)
