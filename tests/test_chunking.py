"""Chunking W3 — bit-for-bit vs a Python replica of the reference loop
(transcripts_to_vector_db.py:194-225), across the FIXTURES.md snippet counts
{10, 29, 35, 36, 64, 70, 100} that pin the tail rule."""

from pyspark.sql import functions as F

from re_data_pipeline_spark.operators.chunking import chunk_snippets, timestamped_link

N, STRIDE = 35, 29


def reference_chunker(items: list[tuple[str, str]], n=N, stride=STRIDE):
    """Direct transcription of the reference algorithm (same control flow)."""
    sorted_items = sorted(items, key=lambda x: int(x[0]))
    out = []
    for i in range(0, len(sorted_items) - n + 1, stride):
        chunk = sorted_items[i : i + n]
        out.append((int(chunk[0][0]), " ".join(t for _, t in chunk), False))
    if len(sorted_items) % stride != 0 and (len(sorted_items) - n) % stride != 0:
        chunk = sorted_items[-n:]
        out.append((int(chunk[0][0]), " ".join(t for _, t in chunk), True))
    return out


def make_snippets(count: int):
    # unsorted keys on purpose — sorting is part of the contract (W2)
    keys = list(range(0, count * 7, 7))
    keys = keys[::-1]
    return [(str(k), f"snippet{k}") for k in keys]


def test_chunking_matches_reference(spark):
    for count in [10, 29, 35, 36, 64, 70, 100]:
        items = make_snippets(count)
        expected = reference_chunker(items)
        df = spark.createDataFrame(
            [(1, [{"ts": ts, "text": tx} for ts, tx in items])],
            "id int, snippets array<struct<ts:string,text:string>>",
        )
        got = (
            chunk_snippets(df, "snippets")
            .orderBy("chunk_index")
            .select("chunk_timestamp", "chunk_text", "is_tail")
            .collect()
        )
        assert [(r.chunk_timestamp, r.chunk_text, r.is_tail) for r in got] == expected, (
            f"count={count}"
        )


def test_tail_link_quirk(spark):
    # main chunks get &t=<ts>s, the tail chunk gets ?t=<ts> (reference :203/:216)
    items = make_snippets(40)
    df = spark.createDataFrame(
        [(1, "http://v", [{"ts": ts, "text": tx} for ts, tx in items])],
        "id int, video_url string, snippets array<struct<ts:string,text:string>>",
    )
    got = timestamped_link("video_url", chunk_snippets(df, "snippets")).collect()
    for r in got:
        if r.is_tail:
            assert r.timestamped_youtube_link == f"http://v?t={r.chunk_timestamp}"
        else:
            assert r.timestamped_youtube_link == f"http://v&t={r.chunk_timestamp}s"


def test_no_chunks_when_modulo_aligns(spark):
    # len=29: range empty, 29 % 29 == 0 → no tail → zero chunks (reference
    # behavior preserved, surprising as it is)
    items = make_snippets(29)
    assert reference_chunker(items) == []
    df = spark.createDataFrame(
        [(1, [{"ts": ts, "text": tx} for ts, tx in items])],
        "id int, snippets array<struct<ts:string,text:string>>",
    )
    assert chunk_snippets(df, "snippets").count() == 0


def test_chunking_exhaustive_counts(spark):
    """Exhaustive conformance: every snippet count 1..120 in one DataFrame,
    chunk output compared against the reference-replica per count."""
    rows = []
    expected = {}
    for count in range(1, 121):
        items = make_snippets(count)
        expected[count] = reference_chunker(items)
        rows.append((count, [{"ts": ts, "text": tx} for ts, tx in items]))
    df = spark.createDataFrame(
        rows, "cnt int, snippets array<struct<ts:string,text:string>>"
    )
    got = {}
    for r in (
        chunk_snippets(df, "snippets")
        .select("cnt", "chunk_index", "chunk_timestamp", "chunk_text", "is_tail")
        .collect()
    ):
        got.setdefault(r.cnt, []).append(
            (r.chunk_index, r.chunk_timestamp, r.chunk_text, r.is_tail)
        )
    for count in range(1, 121):
        want = [
            (i, ts, tx, tail) for i, (ts, tx, tail) in enumerate(expected[count])
        ]
        assert sorted(got.get(count, [])) == want, f"count={count}"


def test_chunk_snippets_null_array_yields_no_chunks(spark):
    """size(NULL) = -1 in non-ANSI mode and pmod(-1, stride) != 0, so a NULL
    snippets array used to emit ONE phantom all-NULL tail chunk (which then
    flowed into embedding/retrieval); it must produce zero chunk rows."""
    from re_data_pipeline_spark.operators.chunking import chunk_snippets

    df = spark.createDataFrame(
        [(1, None), (2, [{"ts": "0", "text": "a"}] * 40)],
        "tid int, snippets array<struct<ts:string,text:string>>",
    )
    got = chunk_snippets(df, "snippets").select("tid").collect()
    assert {r.tid for r in got} == {2}
