"""Persisted inverted index [extension — not in reference].

The steady-state counterpart of ``queries/search_ext.py::
conjunctive_token_search``: the corpus-sized explode→count pass runs
ONCE at ingest time and materializes the posting lists; every later
search probes the standing index and never touches document text.

Two relations under ``index_path``:

- ``postings/`` (term, doc_id, tf), **partitioned by term_bucket**
  (md5-derived, 16 buckets) — a probe for a term set prunes to its
  buckets' directories, so a 3-term query reads ≤3/16 of the postings
  however large the corpus.
- ``lexicon/`` (term, df) — document frequency per term, the idf side;
  vocabulary-sized, broadcast at probe time.

Probing the index is pytest-asserted byte-identical to the inline query
(tests/test_inverted_index.py), the same build/probe contract as the
persisted MinHash index (operators/neardup_index.py).

Reference scope note: the reference (/root/reference/main.go:47-54)
persists exactly one artifact — the partitioned record files; this
extends its write path with a derived search artifact. [extension]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.snapshots import read_parquet_fast

N_TERM_BUCKETS = 16


def _term_bucket(col) -> F.Column:
    """Stable md5-derived bucket (not Spark's hash(), so the on-disk layout
    is engine/version-independent like every other persisted artifact)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % N_TERM_BUCKETS
    ).cast("int")


def build_inverted_index(spark: SparkSession, sf_dir: str, index_path: str) -> None:
    """One corpus pass -> postings + lexicon parquet under ``index_path``."""
    from iceberg_file_writer_spark.operators.text import words
    from iceberg_file_writer_spark.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    postings = (
        docs.select("doc_id", F.explode(words(F.col("text"))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
        .withColumn("term_bucket", _term_bucket(F.col("term")))
    )
    (
        postings.repartition("term_bucket")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .option("compression", "snappy")
        .partitionBy("term_bucket")
        .parquet(f"{index_path}/postings")
    )
    lexicon = postings.groupBy("term").agg(F.count("*").alias("df"))
    lexicon.write.mode("overwrite").option("compression", "snappy").parquet(
        f"{index_path}/lexicon"
    )
    # n_docs: the 1-row corpus size the idf needs (an index header, not a
    # driver-side constant — probes join it as a broadcast relation)
    docs.agg(F.count("*").cast("long").alias("n_docs")).write.mode(
        "overwrite"
    ).parquet(f"{index_path}/meta")


def conjunctive_search_index(
    spark: SparkSession,
    index_path: str,
    terms: tuple[str, ...],
    top_k: int = 20,
) -> DataFrame:
    """AND-of-terms tf·idf search against the persisted index.

    Scale shape: the postings scan prunes to the probed terms' buckets
    (partition filter on term_bucket — pushed to the directory listing)
    and then to the terms themselves (pushed parquet filter over the
    sorted term column → row-group pruning); df/n_docs are broadcast.
    Document text is never read.
    """
    buckets = sorted(
        {
            int.from_bytes(__import__("hashlib").md5(t.encode()).digest()[:4], "big")
            % N_TERM_BUCKETS
            for t in terms
        }
    )
    postings = (
        read_parquet_fast(spark, f"{index_path}/postings")
        .where(F.col("term_bucket").isin(buckets))
        .where(F.col("term").isin(*terms))
    )
    df_rel = read_parquet_fast(spark, f"{index_path}/lexicon").where(
        F.col("term").isin(*terms)
    )
    n = read_parquet_fast(spark, f"{index_path}/meta")
    scored = (
        postings.join(F.broadcast(df_rel), "term")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("tf")
                    * F.round(F.log(F.col("n_docs").cast("double") / F.col("df")), 6)
                ),
                6,
            ).alias("score"),
            F.countDistinct("term").alias("nterms"),
        )
        .where(F.col("nterms") == len(terms))
        .select("doc_id", "score")
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(top_k)


_APPEND_MARKER = ".append-commit"
_APPLIED_SHARDS = "applied_shards.json"


def _recover_append(index_path: str) -> None:
    """Roll a crashed append to a consistent state.

    The append is ALL-OR-NOTHING across postings + lexicon + meta,
    decided by the ``.append-commit`` marker:

    - marker ABSENT: the crash hit during staging — the live index was
      never touched. Rollback: drop ``postings.staged``/``*.tmp``, and
      restore/drop any stranded ``*.old`` from an earlier protocol.
    - marker PRESENT: both small relations were fully staged and the
      commit phase had begun — roll FORWARD by re-running it (each step
      is idempotent: already-moved posting files are gone from staging,
      an already-swapped relation has no ``.tmp`` left).
    """
    import os
    import shutil

    marker = f"{index_path}/{_APPEND_MARKER}"
    staged = f"{index_path}/postings.staged"
    if os.path.exists(marker):
        _commit_append(index_path)
        return
    # a crash mid-marker-write leaves only the .tmp (write_atomic): the
    # append never committed — roll back with the staging
    if os.path.exists(marker + ".tmp"):
        os.remove(marker + ".tmp")
    if os.path.exists(staged):
        shutil.rmtree(staged)
    for rel in ("lexicon", "meta"):
        live, tmp, old = (f"{index_path}/{rel}{s}" for s in ("", ".tmp", ".old"))
        if os.path.exists(old):
            if os.path.exists(live):
                shutil.rmtree(old)
            else:
                os.rename(old, live)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)


def _commit_append(index_path: str) -> None:
    """The idempotent commit phase (runs under the marker; re-runnable
    from any crash point): move staged posting files into their live
    term-bucket partitions, swap lexicon/meta, record the shard id,
    clean up, drop the marker."""
    import os
    import shutil

    from iceberg_file_writer_spark.ingest.ledger import ledger_add

    staged = f"{index_path}/postings.staged"
    live_postings = f"{index_path}/postings"
    if os.path.isdir(staged):
        for part in sorted(os.listdir(staged)):
            src_dir = os.path.join(staged, part)
            if not part.startswith("term_bucket=") or not os.path.isdir(src_dir):
                continue
            dst_dir = os.path.join(live_postings, part)
            os.makedirs(dst_dir, exist_ok=True)
            for fname in sorted(os.listdir(src_dir)):
                if fname.endswith(".parquet") and not fname.startswith(("_", ".")):
                    os.rename(
                        os.path.join(src_dir, fname), os.path.join(dst_dir, fname)
                    )
    for rel in ("lexicon", "meta"):
        livep, tmp, old = (f"{index_path}/{rel}{s}" for s in ("", ".tmp", ".old"))
        if os.path.exists(tmp):
            if os.path.exists(livep):
                os.rename(livep, old)
            os.rename(tmp, livep)
        if os.path.exists(old):
            shutil.rmtree(old)
    marker = f"{index_path}/{_APPEND_MARKER}"
    if os.path.exists(marker):
        with open(marker) as f:
            shard_id = f.read().strip()
        if shard_id:
            # bounded, atomically-rewritten ledger (ingest/ledger.py)
            ledger_add(f"{index_path}/{_APPLIED_SHARDS}", shard_id)
    if os.path.isdir(staged):
        shutil.rmtree(staged)
    if os.path.exists(marker):
        os.remove(marker)


def append_to_inverted_index(
    spark: SparkSession,
    new_docs: DataFrame,
    index_path: str,
    shard_id: str | None = None,
) -> None:
    """Per-ingest index maintenance: fold a new shard into the standing
    index without re-reading corpus text.

    - ``postings/``: the shard's postings land in their term-bucket
      partitions (doc_ids are new, so no per-term merge is needed — the
      posting list of a term is the union of its rows across files).
    - ``lexicon/``: per-term df of old + shard summed — a
      vocabulary-sized merge, orders smaller than the corpus.
    - ``meta/``: n_docs incremented.

    The append is ATOMIC across all three relations: postings stage into
    ``postings.staged`` and the small relations into ``*.tmp``, then a
    commit marker flips the append from rollback-on-crash to
    roll-forward-on-crash — the commit phase (file moves + two-rename
    swaps) is idempotent and completed by the next append's recovery, so
    a crash can never publish postings without their lexicon/meta (the
    tear the pre-round-6 mode('append') write allowed). Pass a stable
    ``shard_id`` to make caller retries exactly-once: an id recorded in
    ``applied_shards.json`` (written atomically during commit) makes a
    replayed append a no-op — without it a caller retrying a crashed
    call that had already reached the marker would fold the shard twice.
    Appending shard-by-shard is pytest-asserted byte-identical to
    rebuilding from scratch, including across injected crashes at every
    commit step.
    """
    from iceberg_file_writer_spark.ingest.ledger import ledger_contains
    from iceberg_file_writer_spark.operators.text import words

    # recover a crashed prior append before touching anything
    _recover_append(index_path)

    if shard_id is not None:
        shard_id = str(shard_id)  # tolerate int foreachBatch epoch ids
        if ledger_contains(f"{index_path}/{_APPLIED_SHARDS}", shard_id):
            return  # replayed shard: already folded

    shard = (
        new_docs.select("doc_id", F.explode(words(F.col("text"))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
        .withColumn("term_bucket", _term_bucket(F.col("term")))
    )
    (
        shard.repartition("term_bucket")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .option("compression", "snappy")
        .partitionBy("term_bucket")
        .parquet(f"{index_path}/postings.staged")
    )
    new_lex = shard.groupBy("term").agg(F.count("*").alias("df"))
    merged = (
        read_parquet_fast(spark, f"{index_path}/lexicon")
        .unionByName(new_lex)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    merged.write.mode("overwrite").option("compression", "snappy").parquet(
        f"{index_path}/lexicon.tmp"
    )
    new_meta = (
        read_parquet_fast(spark, f"{index_path}/meta")
        .crossJoin(new_docs.agg(F.count("*").cast("long").alias("add")))
        .select((F.col("n_docs") + F.col("add")).alias("n_docs"))
    )
    new_meta.write.mode("overwrite").parquet(f"{index_path}/meta.tmp")

    # everything staged: flip to roll-forward and commit (marker fsync'd
    # + rename-installed so a crash cannot leave a truncated marker)
    from iceberg_file_writer_spark.ingest.ledger import write_atomic

    write_atomic(f"{index_path}/{_APPEND_MARKER}", shard_id or "")
    _commit_append(index_path)
