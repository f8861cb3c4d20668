"""Table-scoped inverted text index with BM25 probes [extension — not
in reference].

``operators/inverted_index.py`` persists postings for the fixed
``documents`` corpus; this module is its SNAPSHOT-TABLE twin, wired to
the statement surface:

    CREATE INDEX ON t (id_col, text_col) USING INVERTED   -- build/refresh
    SELECT ... FROM text_search('t', 'spark window', 10)   -- BM25 top-k
    SHOW INDEXES ON t                                      -- coverage
    DROP INDEX ON t                                        -- (bloom) /
                                                    drop_text_index API

Design — Lucene-shaped segments over the table's manifest:

- the index lives under ``<table>/_text_index/`` as SEGMENT directories
  (``segments/<uuid>/postings/``, parquet partitioned by a stable
  md5-derived ``term_bucket``) plus one atomically-published
  ``meta.json`` listing the live segments; a crash mid-build leaves an
  orphan segment no reader ever sees (the agg-view state-pointer
  discipline).
- postings rows are ``(term_bucket, term, doc_id, tf, dl)`` — document
  length DENORMALIZED into the posting (Lucene's norms), so a probe
  needs no doc-side join at all: read the query terms' buckets, derive
  df by counting the very rows read, pull n_docs/avgdl from meta sums.
- freshness is a manifest fingerprint, not a version number: the index
  is FRESH iff the data-file name set and the DV/equality-delete state
  are unchanged since the last build — metadata-only commits (renames,
  widenings, bloom attaches, specs) can never force a rebuild.
  Re-running CREATE INDEX when the table has only APPENDED files
  indexes just the new files as one new segment (O(new data)); any
  retraction (CoW rewrite, MoR delete, compaction) rebuilds — postings
  cannot retract a row they cannot see.
- probing a STALE index raises with the re-run remedy instead of
  serving ghosts — deterministic results or a loud error, never
  "approximately current".

At 100 TB: a query reads <= len(terms)/16 of each segment's postings
via partition pruning, df/idf derive from that same read, and scoring
runs on the match-sized relation with a TakeOrderedAndProject head.
The refresh path is O(appended files), exactly the ingest cadence.

BM25 math and rounding discipline are IDENTICAL to
``queries/search_ext.py::bm25_ranked_search`` (k1=1.2, b=0.75, Lucene
idf, per-term round(6) before the per-doc sum) so index-served scores
are byte-comparable to the inline query and its DuckDB oracle.

Reference scope note: the reference (/root/reference/main.go:47-54)
persists partitioned record files; this derives a search artifact from
that write path's output. [extension]
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.ledger import write_atomic

_DIR = "_text_index"
_META = "meta.json"
N_TERM_BUCKETS = 16
BM25_K1 = 1.2
BM25_B = 0.75


def _meta_path(table_path: str) -> str:
    return os.path.join(table_path, _DIR, _META)


def read_text_index_meta(table_path: str) -> "dict | None":
    try:
        with open(_meta_path(table_path)) as f:
            return json.load(f)
    except OSError:
        return None


def _term_bucket(col) -> F.Column:
    """Stable md5-derived bucket (same scheme as the corpus index —
    engine/version-independent on-disk layout)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % N_TERM_BUCKETS
    ).cast("int")


def _bucket_of(term: str) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % N_TERM_BUCKETS


def _fingerprint(m: dict) -> dict:
    """The index-relevant manifest state: which data files are visible
    and under what tombstone state. Metadata-only commits leave it
    unchanged."""
    files = sorted(os.path.basename(e["path"]) for e in m.get("files") or [])
    return {
        "files": files,
        "dvs_sig": hashlib.md5(
            json.dumps(m.get("dvs") or [], sort_keys=True).encode()
        ).hexdigest(),
        "eqs_sig": hashlib.md5(
            json.dumps(m.get("eqs") or [], sort_keys=True).encode()
        ).hexdigest(),
    }


def _resolve_cols(m: dict, meta: dict) -> "tuple[str, str]":
    """CURRENT names of the indexed (id, text) columns — by field id on
    mapped tables (rename-proof), by stored name otherwise."""
    if meta.get("id_field") is not None and "columns" in m:
        id_to_name = {cid: name for cid, name, _t in m["columns"]}
        try:
            return (
                id_to_name[meta["id_field"]],
                id_to_name[meta["text_field"]],
            )
        except KeyError as e:
            raise ValueError(
                "an indexed column was dropped from the table; "
                "DROP INDEX / re-create"
            ) from e
    return meta["id_col"], meta["text_col"]


def _read_entries(
    spark: SparkSession, table_path: str, m: dict, entries: list
) -> DataFrame:
    """Rows of just ``entries`` (fresh appended files: no tombstones by
    construction), through the mapped projection when applicable."""
    if "columns" in m:
        from iceberg_file_writer_spark.ingest.column_mapping import (
            _scan_mapped,
        )

        sub = {
            "files": entries,
            "columns": m["columns"],
            "column_defaults": m.get("column_defaults"),
        }
        return _scan_mapped(spark, table_path, sub)
    from iceberg_file_writer_spark.ingest.snapshots import _read_files

    return _read_files(spark, table_path, entries, None)


def _write_segment(
    spark: SparkSession, docs: DataFrame, seg_abs: str
) -> "tuple[int, int]":
    """One segment from (doc_id, text) rows; returns (n_docs, sum_dl).
    Tokenization = whitespace split, the corpus convention.

    The source relation is scanned ONCE (the postings write); doc
    stats derive from reading back the written postings' (doc_id, dl)
    columns — index-sized columnar IO, not a second pass over the
    table's text. The read-back doubles as the uniqueness check: BM25
    is ill-defined over duplicate ids (the inline query and the DuckDB
    oracle group by doc_id too), so a segment whose ids collide
    refuses instead of silently mis-scoring."""
    ws = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id", F.explode(ws).alias("term"),
        F.size(ws).cast("long").alias("dl"),
    )
    postings = (
        base.groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn("term_bucket", _term_bucket(F.col("term")))
    )
    pdir = os.path.join(seg_abs, "postings")
    postings.write.partitionBy("term_bucket").parquet(pdir)
    try:
        back = spark.read.parquet(pdir)
    except Exception:
        # a zero-doc batch writes no part files at all (partitioned
        # writer), so the read-back has no schema to infer — the
        # segment is legitimately empty
        return 0, 0
    stats = (
        back
        .groupBy("doc_id")
        .agg(F.min("dl").alias("dl"), F.max("dl").alias("dl2"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("dl").cast("long").alias("s"),
            F.sum(F.when(F.col("dl") != F.col("dl2"), 1).otherwise(0))
            .alias("dupes"),
        )
        .first()
    )
    if int(stats.dupes or 0) > 0:
        shutil.rmtree(seg_abs, ignore_errors=True)
        raise ValueError(
            "duplicate doc ids with differing documents in the indexed "
            "batch — BM25 over a non-unique id column is ill-defined; "
            "deduplicate or choose a unique id column"
        )
    return int(stats.n or 0), int(stats.s or 0)


def build_text_index(
    spark: SparkSession, table_path: str, id_col: str, text_col: str
) -> int:
    """Build or refresh the table's inverted index; returns the number
    of data files newly indexed (0 = already fresh). Appends-only
    deltas index as ONE new segment; retractions rebuild."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        current_version,
        read_manifest,
    )

    v = current_version(table_path)
    m = read_manifest(table_path, v)
    fp = _fingerprint(m)
    meta = read_text_index_meta(table_path)

    id_field = text_field = None
    if "columns" in m:
        name_to_id = {name: cid for cid, name, _t in m["columns"]}
        missing = [c for c in (id_col, text_col) if c not in name_to_id]
        if missing:
            raise ValueError(f"no such column(s): {missing}")
        id_field, text_field = name_to_id[id_col], name_to_id[text_col]

    if meta is not None and meta.get("kind") == "inverted":
        old = set(meta["files"])
        new = set(fp["files"])
        same_tombstones = (
            meta["dvs_sig"] == fp["dvs_sig"]
            and meta["eqs_sig"] == fp["eqs_sig"]
        )
        same_cols = (
            (meta.get("id_field"), meta.get("text_field"))
            == (id_field, text_field)
            if id_field is not None
            else (meta["id_col"], meta["text_col"]) == (id_col, text_col)
        )
        if old == new and same_tombstones and same_cols:
            return 0  # fresh — nothing to do
        if old <= new and same_tombstones and same_cols:
            # appends-only: index just the added files as one segment
            added = [
                e
                for e in m["files"]
                if os.path.basename(e["path"]) not in old
            ]
            cur_id, cur_text = _resolve_cols(m, meta)
            docs = _read_entries(spark, table_path, m, added).select(
                F.col(cur_id).alias("doc_id"),
                F.col(cur_text).alias("text"),
            )
            # cross-segment uniqueness: an appended row re-using a
            # standing doc id would split its tf across segments and
            # double-count df — BM25 would silently diverge from the
            # inline computation. One columnar job (doc_id only).
            standing_dirs = [
                os.path.join(table_path, _DIR, s["dir"], "postings")
                for s in meta["segments"]
                if s["n_docs"] > 0
            ]
            if standing_dirs:
                from functools import reduce

                standing_ids = reduce(
                    lambda a, b: a.unionByName(b),
                    [
                        spark.read.parquet(d).select("doc_id")
                        for d in standing_dirs
                    ],
                ).distinct()
                clashes = (
                    docs.select("doc_id")
                    .distinct()
                    .join(standing_ids, "doc_id", "inner")
                    .count()
                )
                if clashes:
                    raise ValueError(
                        f"{clashes} appended doc id(s) already exist in "
                        "the index — BM25 over a non-unique id column "
                        "is ill-defined; use a unique id or rebuild "
                        "after deduplicating"
                    )
            rel = f"segments/{uuid.uuid4().hex}"
            n, s = _write_segment(
                spark, docs, os.path.join(table_path, _DIR, rel)
            )
            meta = dict(meta)
            meta["segments"] = meta["segments"] + [
                {"dir": rel, "n_docs": n, "sum_dl": s}
            ]
            # the generation retired by the LAST rebuild has had its
            # grace cycle — reclaim it here too, or a table maintained
            # purely by appends would keep it forever
            for rel_old in meta.get("retired") or []:
                shutil.rmtree(
                    os.path.join(table_path, _DIR, rel_old),
                    ignore_errors=True,
                )
            meta["retired"] = []
            meta.update(fp)
            meta["version"] = v
            write_atomic(_meta_path(table_path), json.dumps(meta))
            return len(added)
        # retraction / re-target: full rebuild. The replaced generation
        # gets ONE rebuild cycle of grace (the agg-view discipline): a
        # reader that just loaded the old meta still finds its
        # segments; the generation retired by the PREVIOUS rebuild is
        # reclaimed now.
        prior_segments = [s["dir"] for s in meta.get("segments") or []]
        expired_segments = list(meta.get("retired") or [])
    else:
        prior_segments = []
        expired_segments = []

    if "columns" in m:
        from iceberg_file_writer_spark.ingest.column_mapping import read_mapped

        df = read_mapped(spark, table_path)
    else:
        from iceberg_file_writer_spark.ingest.snapshots import (
            read_table_version,
        )

        df = read_table_version(spark, table_path)
    docs = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    rel = f"segments/{uuid.uuid4().hex}"
    n, s = _write_segment(spark, docs, os.path.join(table_path, _DIR, rel))
    meta = {
        "kind": "inverted",
        "id_col": id_col,
        "text_col": text_col,
        "id_field": id_field,
        "text_field": text_field,
        "segments": [{"dir": rel, "n_docs": n, "sum_dl": s}],
        "retired": prior_segments,
        "version": v,
        **fp,
    }
    write_atomic(_meta_path(table_path), json.dumps(meta))
    for rel_old in expired_segments:
        shutil.rmtree(
            os.path.join(table_path, _DIR, rel_old), ignore_errors=True
        )
    return len(fp["files"])


def drop_text_index(table_path: str) -> None:
    root = os.path.join(table_path, _DIR)
    if read_text_index_meta(table_path) is None:
        raise ValueError(f"no text index on {table_path}")
    shutil.rmtree(root, ignore_errors=True)


def text_search(
    spark: SparkSession, table_path: str, query: str, k: int
) -> DataFrame:
    """BM25 top-k over the standing index: ``(id, score,
    n_matched_terms)`` with the id column under its CURRENT table name.
    Raises on a stale index (the table changed since the last build) —
    re-run CREATE INDEX; a probe must be exact or loud, never
    approximately current."""
    from iceberg_file_writer_spark.ingest.snapshots import (
        current_version,
        read_manifest,
    )

    meta = read_text_index_meta(table_path)
    if meta is None or meta.get("kind") != "inverted":
        raise ValueError(
            f"no text index on {table_path}; CREATE INDEX ON t "
            "(id, text) USING INVERTED first"
        )
    m = read_manifest(table_path, current_version(table_path))
    fp = _fingerprint(m)
    if (
        fp["files"] != meta["files"]
        or fp["dvs_sig"] != meta["dvs_sig"]
        or fp["eqs_sig"] != meta["eqs_sig"]
    ):
        raise ValueError(
            f"text index on {table_path} is STALE (table data changed "
            "since the last build); re-run CREATE INDEX ... USING "
            "INVERTED to refresh"
        )
    terms = [t for t in query.split() if t]
    if not terms:
        raise ValueError("empty text_search query")
    cur_id, _cur_text = _resolve_cols(m, meta)
    n_docs = sum(s["n_docs"] for s in meta["segments"])
    sum_dl = sum(s["sum_dl"] for s in meta["segments"])
    seg_dirs = [
        os.path.join(table_path, _DIR, s["dir"], "postings")
        for s in meta["segments"]
        if s["n_docs"] > 0
    ]
    if not seg_dirs or n_docs == 0:
        # typed empty result: the id column keeps its TABLE type (a
        # schema that depended on whether the index is empty would
        # break downstream joins/unions only in the empty case)
        if "columns" in m:
            from iceberg_file_writer_spark.ingest.column_mapping import (
                read_mapped,
            )

            base = read_mapped(spark, table_path)
        else:
            from iceberg_file_writer_spark.ingest.snapshots import (
                read_table_version,
            )

            base = read_table_version(spark, table_path)
        return (
            base.select(cur_id)
            .limit(0)
            .withColumn("score", F.lit(None).cast("double"))
            .withColumn(
                "n_matched_terms", F.lit(None).cast("bigint")
            )
        )
    avgdl = sum_dl / n_docs
    buckets = sorted({_bucket_of(t) for t in terms})
    # one read per segment root (a multi-root partitioned read would
    # make Spark infer partitions from the common ancestor and trip on
    # the uuid segment dirs); the term_bucket filter partition-prunes
    # each root independently
    from functools import reduce

    seg_reads = [
        spark.read.parquet(d)
        .where(F.col("term_bucket").isin(buckets))
        .where(F.col("term").isin(terms))
        for d in seg_dirs
    ]
    postings = reduce(lambda a, b: a.unionByName(b), seg_reads)
    # df = number of docs holding the term = posting rows per term, from
    # the very relation just read — no separate lexicon
    dfr = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    # avgdl must enter as a DOUBLE: an unsuffixed decimal literal parses
    # as DECIMAL in Spark SQL, and decimal division would drift a ulp
    # from the inline query's double column (breaking byte-parity)
    scored = postings.join(F.broadcast(dfr), "term").selectExpr(
        "doc_id",
        f"round(round(ln(({n_docs} - df + 0.5) / (df + 0.5) + 1.0), 6)"
        f" * (tf * ({BM25_K1} + 1.0))"
        f" / (tf + {BM25_K1} * (1.0 - {BM25_B}"
        f" + {BM25_B} * (dl / CAST({avgdl!r} AS DOUBLE)))), 6)"
        " AS term_score",
    )
    out = scored.groupBy("doc_id").agg(
        F.round(F.sum("term_score"), 6).alias("score"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )
    return (
        out.orderBy(F.desc("score"), "doc_id")
        .limit(k)
        .withColumnRenamed("doc_id", cur_id)
    )


def text_index_report(table_path: str) -> list:
    """SHOW INDEXES rows for the inverted index: (column, kind,
    docs_indexed, segments) — sized in docs/segments, the units that
    matter for a postings artifact."""
    meta = read_text_index_meta(table_path)
    if meta is None:
        return []
    from iceberg_file_writer_spark.ingest.snapshots import (
        current_version,
        read_manifest,
    )

    m = read_manifest(table_path, current_version(table_path))
    try:
        _cur_id, cur_text = _resolve_cols(m, meta)
    except ValueError:
        cur_text = meta["text_col"]
    return [
        (
            cur_text,
            "inverted",
            sum(s["n_docs"] for s in meta["segments"]),
            len(meta["segments"]),
        )
    ]
