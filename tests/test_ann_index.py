"""Persisted ANN index: build/probe parity, load-or-train seam, append.

The contract mirrors the other persisted indexes (neardup_index,
inverted_index): probing the artifact is row-identical to the inline
entries, a fresh process with a pre-built artifact never trains, and
incremental appends are atomic + exactly-once with FROZEN quantizers.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_file_writer_spark.operators import ann_index as AI
from iceberg_file_writer_spark.queries import similarity as S

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "index")
    AI.build_ann_index(spark, SF_DIR, path)
    return path


def test_ivf_probe_matches_inline(spark, index_path):
    assert _canon(AI.ivf_probe_index(spark, SF_DIR, index_path)) == _canon(
        S.ivf_knn_cosine(spark, SF_DIR)
    )


def test_pq_probe_matches_inline(spark, index_path):
    assert _canon(AI.pq_probe_index(spark, SF_DIR, index_path)) == _canon(
        S.knn_pq_adc_rerank(spark, SF_DIR)
    )


def test_artifact_relations_are_the_inline_encodings(spark, index_path):
    """The stored assignment/code relations equal the inline encode plans'
    outputs exactly — the index IS the inline computation, persisted."""
    emb = S._emb_cached(spark, SF_DIR)
    cents = S._trained_centroids_df(spark, emb, SF_DIR)
    want_assign = _canon(S._ivf_assign(emb, cents))
    got_assign = _canon(AI._read_assign(spark, index_path))
    assert got_assign == want_assign
    books = S._pq_codebooks_df(spark, SF_DIR)
    want_codes = _canon(S._pq_encode(S._pq_sub_rel(spark, SF_DIR), books))
    got_codes = _canon(AI._codes_stacked(spark, index_path))
    assert got_codes == want_codes


def test_fresh_session_probe_runs_no_training(spark, index_path, monkeypatch):
    """use_ann_index + pre-built artifact => the inline entries load the
    quantizers from parquet and never invoke a trainer (the 100 TB
    posture: train at ingest, probe forever). Simulates a fresh process
    by clearing the in-process memos and making every trainer raise."""
    inline_ivf = _canon(S.ivf_knn_cosine(spark, SF_DIR))
    inline_pq = _canon(S.knn_pq_adc_rerank(spark, SF_DIR))
    monkeypatch.delitem(S._TRAINED, SF_DIR, raising=False)
    monkeypatch.delitem(S._PQ_CODEBOOKS, SF_DIR, raising=False)
    monkeypatch.setitem(S._ANN_INDEX_PATHS, SF_DIR, index_path)

    def boom(*a, **k):
        raise AssertionError("training job ran despite persisted artifact")

    monkeypatch.setattr(S, "_train_centroids", boom)
    monkeypatch.setattr(S, "_train_pq_codebooks_rows", boom)
    try:
        assert _canon(S.ivf_knn_cosine(spark, SF_DIR)) == inline_ivf
        assert _canon(S.knn_pq_adc_rerank(spark, SF_DIR)) == inline_pq
    finally:
        # artifact-loaded memo entries die with the monkeypatched path
        S._TRAINED.pop(SF_DIR, None)
        S._PQ_CODEBOOKS.pop(SF_DIR, None)


def _shard(spark, n=40, shift=1_000_000):
    """A synthetic new shard: existing embeddings under shifted vec_ids
    (new ids, realistic geometry)."""
    from iceberg_file_writer_spark.tables import load_tables

    return (
        load_tables(spark, SF_DIR)["embeddings"]
        .where(F.col("vec_id") < n)
        .select((F.col("vec_id") + shift).alias("vec_id"), "embedding")
    )


def test_append_uses_frozen_quantizers_and_updates_meta(spark, tmp_path):
    idx = str(tmp_path / "idx")
    AI.build_ann_index(spark, SF_DIR, idx)
    n0 = spark.read.parquet(os.path.join(idx, "meta")).first().n_vecs
    before_assign = _canon(AI._read_assign(spark, idx))
    shard = _shard(spark)
    AI.append_to_ann_index(spark, shard, idx, shard_id="s1")

    cents = AI._read_centroids(spark, idx)
    books = spark.read.parquet(os.path.join(idx, "codebooks"))
    want_new_assign = _canon(S._ivf_assign(AI._unpacked(shard), cents))
    got_assign = _canon(AI._read_assign(spark, idx))
    assert got_assign == sorted(before_assign + want_new_assign)

    want_new_codes = _canon(S._pq_encode(S._pq_sub_from(shard), books))
    got_new_codes = _canon(
        AI._codes_stacked(spark, idx).where(F.col("vec_id") >= 1_000_000)
    )
    assert got_new_codes == want_new_codes

    n1 = spark.read.parquet(os.path.join(idx, "meta")).first().n_vecs
    assert n1 == n0 + shard.count()

    # replayed shard id: exactly-once no-op
    AI.append_to_ann_index(spark, shard, idx, shard_id="s1")
    assert _canon(AI._read_assign(spark, idx)) == got_assign
    assert spark.read.parquet(os.path.join(idx, "meta")).first().n_vecs == n1


def test_append_crash_rolls_forward_and_back(spark, tmp_path):
    """Marker PRESENT after a crash => recovery completes the append
    (roll forward); marker ABSENT with staged debris => recovery drops
    the staging and the live index is untouched (rollback)."""
    idx = str(tmp_path / "idx")
    AI.build_ann_index(spark, SF_DIR, idx)
    clean_assign = _canon(AI._read_assign(spark, idx))
    n0 = spark.read.parquet(os.path.join(idx, "meta")).first().n_vecs
    shard = _shard(spark, n=10)

    # simulate a crash AFTER staging + marker, BEFORE commit: stage by
    # hand via the real append, then restore the pre-commit state
    AI.append_to_ann_index(spark, shard, idx, shard_id="fwd")
    applied = _canon(AI._read_assign(spark, idx))

    # rollback case: staged dirs without a marker must vanish
    os.makedirs(os.path.join(idx, "ivf_assign.staged", "cent_id=0"))
    os.makedirs(os.path.join(idx, "pq_codes.staged"))
    with open(os.path.join(idx, AI._APPEND_MARKER + ".tmp"), "w") as f:
        f.write("torn")
    AI._recover_append(idx)
    assert not os.path.exists(os.path.join(idx, "ivf_assign.staged"))
    assert not os.path.exists(os.path.join(idx, "pq_codes.staged"))
    assert not os.path.exists(os.path.join(idx, AI._APPEND_MARKER + ".tmp"))
    assert _canon(AI._read_assign(spark, idx)) == applied

    # roll-forward case: a marker + staged meta must commit on recovery
    spark.createDataFrame([(999_999,)], "n_vecs long").write.mode(
        "overwrite"
    ).parquet(os.path.join(idx, "meta.tmp"))
    from iceberg_file_writer_spark.ingest.ledger import write_atomic

    write_atomic(os.path.join(idx, AI._APPEND_MARKER), "crash-epoch")
    AI._recover_append(idx)
    assert spark.read.parquet(os.path.join(idx, "meta")).first().n_vecs == 999_999
    assert not os.path.exists(os.path.join(idx, AI._APPEND_MARKER))
    from iceberg_file_writer_spark.ingest.ledger import ledger_contains

    assert ledger_contains(os.path.join(idx, AI._APPLIED_SHARDS), "crash-epoch")
    assert n0 is not None and clean_assign  # silence unused-var lints


def test_registered_probe_entries_match_inline(spark):
    """The registered eager entries (driver surface) give the inline
    entries' exact rows — the oracle they share is therefore valid for
    both."""
    assert _canon(S.ann_index_ivf_probe(spark, SF_DIR)) == _canon(
        S.ivf_knn_cosine(spark, SF_DIR)
    )
    assert _canon(S.ann_index_pq_probe(spark, SF_DIR)) == _canon(
        S.knn_pq_adc_rerank(spark, SF_DIR)
    )


def test_streaming_shard_append_composition(spark, tmp_path):
    """r7 verdict item 7: the ingest-gate composition — new embedding
    shards ARRIVE via a file stream, foreachBatch folds each micro-batch
    into the standing index (frozen quantizers, exactly-once shard
    ledger), and afterwards BOTH probes against the streamed index are
    row-identical to probes against an index that absorbed the same
    rows in one batch append. Batch boundaries must not matter."""
    import tempfile

    streamed = str(tmp_path / "streamed")
    batched = str(tmp_path / "batched")
    AI.build_ann_index(spark, SF_DIR, streamed)
    AI.build_ann_index(spark, SF_DIR, batched)

    shard = _shard(spark, n=40)
    # one-shot reference append (same frozen quantizers)
    AI.append_to_ann_index(spark, shard, batched, shard_id="all")

    # arrival directory: the same 40 rows split across 2 files, driven
    # one file per micro-batch
    arrivals = tempfile.mkdtemp(prefix="ann-arrivals-")
    shard.repartition(2).write.mode("overwrite").parquet(arrivals)
    ckpt = tempfile.mkdtemp(prefix="ann-ckpt-")

    def _fold(batch_df, batch_id):
        AI.append_to_ann_index(
            batch_df.sparkSession, batch_df, streamed, shard_id=batch_id
        )

    q = (
        spark.readStream.schema(shard.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(arrivals)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # a replayed micro-batch (checkpoint-recovery re-delivery) is a no-op
    AI.append_to_ann_index(spark, shard.limit(10), streamed, shard_id=0)

    for probe in (AI.ivf_probe_index, AI.pq_probe_index):
        got = _canon(probe(spark, SF_DIR, streamed))
        want = _canon(probe(spark, SF_DIR, batched))
        assert got == want and len(got) > 0, probe.__name__
    # and the appended vectors are genuinely visible to the CANDIDATE
    # stage (the probes' exact rerank sources full-precision vectors
    # from the corpus table, which this synthetic shard is not part of —
    # so visibility is asserted on the index relations the candidate
    # generation reads)
    assert (
        AI._read_assign(spark, streamed).where(F.col("vec_id") >= 1_000_000).count()
        == 40
    )
    assert (
        AI._codes_stacked(spark, streamed)
        .where(F.col("vec_id") >= 1_000_000)
        .select("vec_id")
        .distinct()
        .count()
        == 40
    )
    n = spark.read.parquet(os.path.join(streamed, "meta")).first().n_vecs
    assert n == spark.read.parquet(os.path.join(batched, "meta")).first().n_vecs
