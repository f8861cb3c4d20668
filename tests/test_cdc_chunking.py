"""Content-defined chunking: boundaries must be shift-robust — a token
prepended to a document re-chunks only the prefix neighborhood, and the
shared suffix keeps identical chunk digests (which is exactly what fixed
windows cannot do)."""

from __future__ import annotations

from iceberg_file_writer_spark.queries.pipeline_ext import cdc_chunks_df
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _doc_text(spark) -> str:
    return (
        load_tables(spark, SF_DIR)["documents"]
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
        .text
    )


def test_cdc_chunks_are_shift_robust(spark):
    base = _doc_text(spark)
    pair = spark.createDataFrame(
        [(0, base), (1, "zzz " + base)], "doc_id long, text string"
    )
    chunks = cdc_chunks_df(pair).collect()
    a = {r.chunk_hash for r in chunks if r.doc_id == 0}
    b = {r.chunk_hash for r in chunks if r.doc_id == 1}
    shared = a & b
    # everything beyond the first boundary after the edit re-aligns: at
    # most the first couple of chunks may differ
    assert len(shared) >= len(a) - 2, (len(shared), len(a))
    assert len(shared) > 0


def test_cdc_chunks_partition_every_token_exactly_once(spark):
    """Chunks tile the document: token counts per doc sum to the doc's
    token count and chunk indexes are contiguous from 0."""
    docs = load_tables(spark, SF_DIR)["documents"].limit(20)
    chunks = cdc_chunks_df(docs).collect()
    from collections import defaultdict

    per_doc = defaultdict(list)
    for r in chunks:
        per_doc[r.doc_id].append((r.chunk_idx, r.n_tokens))
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, cs in per_doc.items():
        idxs = sorted(i for i, _ in cs)
        assert idxs == list(range(len(cs)))
        assert sum(n for _, n in cs) == len(texts[doc_id].split(" "))


def test_stitch_detection_on_constructed_overlap(spark):
    """Overlapping shards must be detected: when a head document ends ON a
    chunk boundary and the next shard repeats that closing chunk (the
    sliding-window export overlap), the head's last chunk and the tail's
    first chunk hash identically. Construction: truncate a corpus doc at
    an interior boundary-closed chunk with >= 4 tokens (its boundary's
    4-token context lies inside the chunk, so it re-fires when the chunk
    opens the tail document)."""
    from iceberg_file_writer_spark.queries.pipeline_ext import cdc_chunks_df

    base = None
    pick = None
    docs = load_tables(spark, SF_DIR)["documents"].orderBy("doc_id").limit(10)
    for row in docs.collect():
        one = spark.createDataFrame([(0, row.text)], "doc_id long, text string")
        chunks = sorted(
            (r.chunk_idx, r.n_tokens) for r in cdc_chunks_df(one).collect()
        )
        # interior (boundary-closed) chunk with its whole context inside
        start = 0
        for idx, n in chunks[:-1]:
            if n >= 4:
                pick = (start, n)
                break
            start += n
        if pick:
            base = row.text
            break
        pick = None
    assert base is not None, "no corpus doc with an interior >=4-token chunk"

    toks = base.split(" ")
    start, n = pick
    head = " ".join(toks[: start + n])  # ends exactly on the boundary
    tail = " ".join(toks[start : start + n] + ["fresh", "continuation", "words"])
    pair = spark.createDataFrame(
        [(0, head), (1, tail)], "doc_id long, text string"
    )
    pc = cdc_chunks_df(pair).collect()
    last_of_head = max((r for r in pc if r.doc_id == 0), key=lambda r: r.chunk_idx)
    first_of_tail = min((r for r in pc if r.doc_id == 1), key=lambda r: r.chunk_idx)
    assert last_of_head.chunk_hash == first_of_tail.chunk_hash
    assert last_of_head.n_tokens == n
