"""PDF text extraction over binary-document scans (SURVEY §2.1 S10).

Reference flow (``REIT_metrics.py:177-195``): download PDF bytes, open with a
PDF library, iterate pages, ``page.get_text()`` each.  Engine flow: the
``binaryFile`` scan (``registry.read_binary_dir``) yields
``(path, modificationTime, length, content)`` rows; this module turns them
into one row per page via ``mapInPandas`` — extraction runs where the bytes
already are (executor-side, Arrow-batched), never on the driver, so a million
PDFs extract with the same code as ten.

The page extractor is injectable:

- ``pymupdf_page_extractor`` is the production path (PyMuPDF/fitz),
  import-gated — the sandbox lacks the lib, so its test skips when absent;
- tests and the sandbox inject a deterministic fake, keeping the Spark-side
  plumbing (schema, batching, per-page explode) real and covered either way.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# bytes of one document -> list of per-page texts
PageExtractor = Callable[[bytes], list[str]]

PAGES_SCHEMA = "report_name string, page_num int, page_text string"


def pymupdf_page_extractor() -> PageExtractor:
    """Production extractor factory: PyMuPDF (``fitz``), the library the
    reference uses (``REIT_metrics.py:177-195``).  Import-gated — raises
    ImportError at factory call (inside the executor task) when the lib is
    absent, so environments without it fail loudly, not silently."""
    import fitz  # PyMuPDF — optional dependency (install extra: `pdf`)

    def extract(data: bytes) -> list[str]:
        with fitz.open(stream=data, filetype="pdf") as doc:
            return [page.get_text() for page in doc]

    return extract


def extract_pdf_pages(
    binary_df: DataFrame,
    extractor_factory: Callable[[], PageExtractor] = pymupdf_page_extractor,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """``binaryFile`` rows → ``(report_name, page_num, page_text)`` rows.

    One extractor per task (created inside the iterator — the fitz handle is
    never serialized from the driver); page texts come out as ordinary rows
    so everything downstream (classification, LLM extraction) is plain
    DataFrame code.  ``report_name`` is the file's basename without
    extension, matching the reference's report naming."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extract = extractor_factory()
        for pdf in batches:
            rows: list[tuple[str, int, str]] = []
            for path, data in zip(pdf[path_col], pdf[content_col]):
                name = os.path.basename(str(path)).rsplit(".", 1)[0]
                for i, text in enumerate(extract(bytes(data))):
                    rows.append((name, i, text))
            yield pd.DataFrame(rows, columns=["report_name", "page_num", "page_text"])

    return binary_df.mapInPandas(run, PAGES_SCHEMA)
