"""Persisted MinHash near-dup index [extension — not in reference].

The steady-state curation loop never recomputes corpus signatures: they
are built once at ingest time and persisted beside the table (the
"signatures table" seam documented on ``_minhash_pairs_df``); each new
shard then probes the standing index. This module is that seam as a real
API:

- :func:`build_minhash_index` materializes the three index relations to
  parquet — per-document signatures, banded LSH postings (bucketed by
  band for probe-side partition pruning), and distinct-shingle sets for
  exact-Jaccard verification.
- :func:`incremental_neardup_against_index` runs the per-ingest dedup
  gate: the new shard's band hashes (batch-sized, broadcast) probe the
  persisted postings, and only candidate pairs load their shingle sets.

Equivalence to the inline plan is pytest-asserted: probing the persisted
index yields byte-identical pairs to ``incremental_neardup_new_vs_corpus``
(which derives the corpus side in-plan). At 100 TB the difference is the
point — the index build is one corpus pass at ingest, after which every
incremental probe touches signatures/postings only, never document text.

Reference scope note: the reference (/root/reference/main.go:47-54)
persists exactly one artifact — the partitioned record files; the index
extends its write path with derived artifacts the query side probes.
[extension]
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.snapshots import read_parquet_fast


def build_minhash_index(spark: SparkSession, sf_dir: str, index_path: str) -> None:
    """One corpus pass -> three persisted relations under ``index_path``.

    signatures/  (doc_id, h0..h63)         — 64 int64 per document
    postings/    (band_idx, band_hash, doc_id), partitioned by band_idx —
                 a probe for band b prunes to its own directory
    sets/        (doc_id, s array<bigint>) — distinct shingle hashes, the
                 verify-side payload (still orders smaller than text)
    """
    from iceberg_file_writer_spark.operators.text import (
        minhash_band_hash_columns,
    )
    from iceberg_file_writer_spark.queries.dedup import (
        LSH_BANDS,
        _minhash_sig_df,
        _shingle_x_df,
    )

    sig = _minhash_sig_df(spark, sf_dir).cache()
    sig.write.mode("overwrite").parquet(os.path.join(index_path, "signatures"))
    band_arr = F.array(*[F.col(f"band{b}") for b in range(LSH_BANDS)])
    (
        sig.select("doc_id", *minhash_band_hash_columns())
        .select("doc_id", F.posexplode(band_arr).alias("band_idx", "band_hash"))
        .write.mode("overwrite")
        .partitionBy("band_idx")
        .parquet(os.path.join(index_path, "postings"))
    )
    (
        _shingle_x_df(spark, sf_dir, 3)
        .groupBy("doc_id")
        .agg(F.collect_set("x").alias("s"))
        .write.mode("overwrite")
        .parquet(os.path.join(index_path, "sets"))
    )
    sig.unpersist()


def load_index_corpus(
    spark: SparkSession, index_path: str, new_split: int
) -> "tuple[DataFrame, DataFrame]":
    """(corpus_bands, corpus_sets): the standing index's probe-side
    relations, CACHED — a steady-state gate probing many micro-batches
    holds these hot instead of re-listing/re-reading the parquet footers
    every batch (~0.3-0.4 s/batch of the streaming gate's per-batch
    constant at sf0.1). Pass the pair to :func:`probe_docs_against_index`
    via ``corpus=``; results are identical by construction (same plans,
    memoized)."""
    corpus_bands = (
        read_parquet_fast(spark, os.path.join(index_path, "postings"))
        .where(F.col("doc_id") < new_split)
        .select(F.col("doc_id").alias("corpus_doc_id"), "band_idx", "band_hash")
        .cache()
    )
    corpus_sets = (
        read_parquet_fast(spark, os.path.join(index_path, "sets"))
        .where(F.col("doc_id") < new_split)
        .select(F.col("doc_id").alias("corpus_doc_id"), F.col("s").alias("sb"))
        .cache()
    )
    return corpus_bands, corpus_sets


def probe_docs_against_index(
    new_docs: DataFrame,
    index_path: str,
    new_split: int,
    corpus: "tuple[DataFrame, DataFrame] | None" = None,
) -> DataFrame:
    """Probe any (doc_id, text) relation against a standing index.

    The probe side computes its signatures inline — it is the data being
    ingested (a batch shard or one streaming micro-batch); the corpus
    side reads ONLY the persisted postings/sets (pushdown-filtered to
    ``doc_id < new_split`` so a replayed build is harmless), or reuses a
    pre-loaded ``corpus`` pair from :func:`load_index_corpus` when the
    caller probes repeatedly. Plan posture: batch-sized band relation
    broadcast, corpus never shuffles for the candidate join,
    verification candidate-sized.
    """
    from iceberg_file_writer_spark.operators.text import (
        jaccard,
        minhash_band_hash_columns,
    )
    from iceberg_file_writer_spark.queries.dedup import (
        LSH_BANDS,
        MINHASH_JACCARD_THRESHOLD,
        minhash_sig_from_docs,
        shingle_x_from_docs,
    )

    spark = new_docs.sparkSession
    band_arr = F.array(*[F.col(f"band{b}") for b in range(LSH_BANDS)])
    new_bands = (
        minhash_sig_from_docs(new_docs)
        .select("doc_id", *minhash_band_hash_columns())
        .select("doc_id", F.posexplode(band_arr).alias("band_idx", "band_hash"))
        .select(F.col("doc_id").alias("new_doc_id"), "band_idx", "band_hash")
    )
    if corpus is not None:
        corpus_bands, corpus_sets = corpus
    else:
        corpus_bands = (
            read_parquet_fast(spark, os.path.join(index_path, "postings"))
            .where(F.col("doc_id") < new_split)
            .select(
                F.col("doc_id").alias("corpus_doc_id"), "band_idx", "band_hash"
            )
        )
        corpus_sets = (
            read_parquet_fast(spark, os.path.join(index_path, "sets"))
            .where(F.col("doc_id") < new_split)
            .select(F.col("doc_id").alias("corpus_doc_id"), F.col("s").alias("sb"))
        )
    cands = (
        corpus_bands.join(F.broadcast(new_bands), ["band_idx", "band_hash"])
        .select("new_doc_id", "corpus_doc_id")
        .distinct()
    )
    new_sets = (
        shingle_x_from_docs(new_docs, 3)
        .groupBy("doc_id")
        .agg(F.collect_set("x").alias("s"))
        .select(F.col("doc_id").alias("new_doc_id"), F.col("s").alias("sa"))
    )
    return (
        cands.join(F.broadcast(new_sets), "new_doc_id")
        .join(corpus_sets, "corpus_doc_id")
        .select(
            "new_doc_id",
            "corpus_doc_id",
            jaccard(F.col("sa"), F.col("sb")).alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= MINHASH_JACCARD_THRESHOLD)
    )


def incremental_neardup_against_index(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    new_split: int,
) -> DataFrame:
    """The per-ingest dedup gate: the new shard of ``sf_dir``'s documents
    table (``doc_id >= new_split``) probed against the standing index."""
    from iceberg_file_writer_spark.tables import load_tables

    new_docs = (
        load_tables(spark, sf_dir)["documents"]
        .where(F.col("doc_id") >= new_split)
        .select("doc_id", "text")
    )
    return probe_docs_against_index(new_docs, index_path, new_split)
