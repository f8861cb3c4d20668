"""The persisted MinHash index must be a pure materialization: probing it
gives byte-identical pairs to the inline query that derives the corpus
side in-plan (incremental_neardup_new_vs_corpus), and the probe plan must
keep the broadcast posture with the corpus side never shuffling."""

from __future__ import annotations

import re

from iceberg_file_writer_spark.operators.neardup_index import (
    build_minhash_index,
    incremental_neardup_against_index,
)
from iceberg_file_writer_spark.queries import all_queries
from iceberg_file_writer_spark.queries.dedup import NEW_BATCH_SPLIT

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.new_doc_id, r.corpus_doc_id, round(r.jaccard_sim, 9)) for r in df.collect()
    )


def test_index_probe_equals_inline_incremental(spark, tmp_path):
    idx = str(tmp_path / "neardup-index")
    build_minhash_index(spark, SF_DIR, idx)
    probe = incremental_neardup_against_index(spark, SF_DIR, idx, NEW_BATCH_SPLIT)
    inline = all_queries()["incremental_neardup_new_vs_corpus"].fn(spark, SF_DIR)
    got, want = _rows(probe), _rows(inline)
    assert got == want and len(got) > 0, (len(got), len(want))


def test_index_probe_broadcasts_new_side(spark, tmp_path):
    idx = str(tmp_path / "neardup-index2")
    build_minhash_index(spark, SF_DIR, idx)
    df = incremental_neardup_against_index(spark, SF_DIR, idx, NEW_BATCH_SPLIT)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p
    # the persisted corpus relations are scanned, never re-derived from text
    assert len(re.findall(r"Location: InMemoryFileIndex \[[^\]]*neardup-index2", p)) >= 2, p
