"""Table-scoped inverted text index: CREATE INDEX ... USING INVERTED,
BM25 text_search('t', query, k) through execute_query, freshness
fingerprinting (appends-only incremental vs retraction rebuild), and
byte-parity of index-served scores with the inline BM25 computation.
"""

from __future__ import annotations

import os
import random
import tempfile

import pytest

from pyspark.sql import functions as F

from iceberg_file_writer_spark.ingest.snapshots import commit_append
from iceberg_file_writer_spark.ingest.text_index import (
    read_text_index_meta,
)
from iceberg_file_writer_spark.sql_dml import (
    execute_dml,
    execute_query,
    execute_script,
)

VOCAB = ["spark", "window", "hash", "join", "scan", "shuffle", "codegen",
         "parquet", "bloom", "manifest"]


def _doc_rows(rng, n, start=0):
    return [
        (start + i,
         " ".join(rng.choices(VOCAB, k=rng.randint(3, 12))))
        for i in range(n)
    ]


def _inline_bm25(spark, docs, terms, k):
    """The bm25_ranked_search computation inline over ``docs`` —
    identical math + rounding; the index-served result must match it
    byte-for-byte."""
    ws = F.split(F.col("text"), " ")
    dl = docs.select(
        "doc_id", F.size(ws).cast("long").alias("dl")
    )
    avgdl = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
    )
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    postings = (
        docs.select("doc_id", F.explode(ws).alias("term"))
        .where(F.col("term").isin(list(terms)))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfr = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    scored = (
        postings.join(F.broadcast(dfr), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(avgdl))
        .selectExpr(
            "doc_id",
            "round(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 6)"
            " * (tf * (1.2 + 1.0))"
            " / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl))), 6)"
            " AS term_score",
        )
    )
    out = scored.groupBy("doc_id").agg(
        F.round(F.sum("term_score"), 6).alias("score"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )
    return [
        (r.doc_id, r.score, r.n_matched_terms)
        for r in out.orderBy(F.desc("score"), "doc_id").limit(k).collect()
    ]


@pytest.fixture()
def plain(spark, tmp_path):
    rng = random.Random(7)
    t = str(tmp_path / "t")
    commit_append(
        spark,
        spark.createDataFrame(
            _doc_rows(rng, 120), "doc_id bigint, text string"
        ).coalesce(1),
        t,
        max_rows=40,
    )
    return t


class TestTextIndexLifecycle:
    def test_probe_matches_inline_bm25(self, spark, plain):
        n = execute_dml(
            spark,
            "CREATE INDEX ON t (doc_id, text) USING INVERTED",
            {"t": plain},
        )
        assert n == 3  # 120 rows / 40 per file
        got = [
            (r.doc_id, r.score, r.n_matched_terms)
            for r in execute_query(
                spark,
                "SELECT * FROM text_search('t', 'spark window hash', 10)",
                {"t": plain},
            ).collect()
        ]
        from iceberg_file_writer_spark.ingest.snapshots import (
            read_table_version,
        )

        want = _inline_bm25(
            spark,
            read_table_version(spark, plain),
            ("spark", "window", "hash"),
            10,
        )
        assert got == want

    def test_fresh_recreate_is_noop(self, spark, plain):
        execute_dml(
            spark,
            "CREATE INDEX ON t (doc_id, text) USING INVERTED",
            {"t": plain},
        )
        assert (
            execute_dml(
                spark,
                "CREATE INDEX ON t (doc_id, text) USING INVERTED",
                {"t": plain},
            )
            == 0
        )

    def test_stale_probe_raises_and_incremental_refresh(self, spark, plain):
        execute_dml(
            spark,
            "CREATE INDEX ON t (doc_id, text) USING INVERTED",
            {"t": plain},
        )
        rng = random.Random(11)
        commit_append(
            spark,
            spark.createDataFrame(
                _doc_rows(rng, 40, start=1000), "doc_id bigint, text string"
            ).coalesce(1),
            plain,
            max_rows=40,
        )
        with pytest.raises(ValueError, match="STALE"):
            execute_query(
                spark,
                "SELECT * FROM text_search('t', 'spark', 5)",
                {"t": plain},
            )
        n = execute_dml(
            spark,
            "CREATE INDEX ON t (doc_id, text) USING INVERTED",
            {"t": plain},
        )
        assert n == 1  # only the appended file
        meta = read_text_index_meta(plain)
        assert len(meta["segments"]) == 2  # incremental = one new segment
        got = [
            (r.doc_id, r.score, r.n_matched_terms)
            for r in execute_query(
                spark,
                "SELECT * FROM text_search('t', 'spark window', 15)",
                {"t": plain},
            ).collect()
        ]
        from iceberg_file_writer_spark.ingest.snapshots import (
            read_table_version,
        )

        want = _inline_bm25(
            spark,
            read_table_version(spark, plain),
            ("spark", "window"),
            15,
        )
        assert got == want

    def test_retraction_rebuilds(self, spark, plain):
        execute_dml(
            spark,
            "CREATE INDEX ON t (doc_id, text) USING INVERTED",
            {"t": plain},
        )
        execute_dml(
            spark, "DELETE FROM t WHERE doc_id % 3 = 0", {"t": plain}
        )
        n = execute_dml(
            spark,
            "CREATE INDEX ON t (doc_id, text) USING INVERTED",
            {"t": plain},
        )
        assert n >= 1
        meta = read_text_index_meta(plain)
        assert len(meta["segments"]) == 1  # full rebuild
        assert meta["retired"]  # replaced generation kept one cycle
        from iceberg_file_writer_spark.ingest.snapshots import (
            read_table_version,
        )

        got = [
            (r.doc_id, r.score, r.n_matched_terms)
            for r in execute_query(
                spark,
                "SELECT * FROM text_search('t', 'spark window', 10)",
                {"t": plain},
            ).collect()
        ]
        want = _inline_bm25(
            spark, read_table_version(spark, plain), ("spark", "window"), 10
        )
        assert got == want

    def test_search_composes_in_join(self, spark, plain):
        execute_dml(
            spark,
            "CREATE INDEX ON t (doc_id, text) USING INVERTED",
            {"t": plain},
        )
        rows = execute_query(
            spark,
            "SELECT s.doc_id, s.score, length(d.text) AS tl "
            "FROM text_search('t', 'spark window', 5) s "
            "JOIN t d ON s.doc_id = d.doc_id ORDER BY s.score DESC, "
            "s.doc_id",
            {"t": plain},
        ).collect()
        assert len(rows) == 5 and all(r.tl > 0 for r in rows)

    def test_show_and_drop_both_index_kinds(self, spark, plain):
        execute_script(
            spark,
            """
            CREATE INDEX ON t (doc_id, text) USING INVERTED;
            CREATE INDEX ON t (doc_id) USING BLOOM;
            """,
            {"t": plain},
        )
        rows = execute_query(
            spark, "SHOW INDEXES ON t", {"t": plain}
        ).collect()
        kinds = {r.kind for r in rows}
        assert kinds == {"bloom", "inverted"}
        execute_dml(spark, "DROP INDEX ON t", {"t": plain})
        assert (
            execute_query(spark, "SHOW INDEXES ON t", {"t": plain}).count()
            == 0
        )
        with pytest.raises(ValueError, match="no text index"):
            execute_query(
                spark,
                "SELECT * FROM text_search('t', 'spark', 5)",
                {"t": plain},
            )

    def test_metadata_only_commits_stay_fresh(self, spark):
        # rename on a mapped table must NOT invalidate the index (the
        # fingerprint tracks data-file/tombstone state, not versions),
        # and the probe's id column follows the CURRENT name
        wh = tempfile.mkdtemp(prefix="txtm-")
        rng = random.Random(3)
        spark.createDataFrame(
            _doc_rows(rng, 60), "doc_id bigint, text string"
        ).createOrReplaceTempView("txt_src")
        execute_script(
            spark,
            """
            CREATE TABLE dt AS SELECT doc_id, text FROM txt_src;
            CREATE INDEX ON dt (doc_id, text) USING INVERTED;
            ALTER TABLE dt RENAME COLUMN doc_id TO did;
            """,
            catalog=wh,
        )
        assert (
            execute_dml(
                spark,
                "CREATE INDEX ON dt (did, text) USING INVERTED",
                catalog=wh,
            )
            == 0
        )  # still fresh: rename was metadata-only
        rows = execute_query(
            spark,
            "SELECT * FROM text_search('dt', 'spark window', 5)",
            catalog=wh,
        ).collect()
        assert rows and rows[0].did is not None  # current name surfaces

    def test_unknown_table_and_empty_query_error(self, spark, plain):
        with pytest.raises(ValueError, match="unknown table"):
            execute_query(
                spark,
                "SELECT * FROM text_search('nope', 'spark', 5)",
                {"t": plain},
            )
        execute_dml(
            spark,
            "CREATE INDEX ON t (doc_id, text) USING INVERTED",
            {"t": plain},
        )
        with pytest.raises(ValueError, match="empty"):
            execute_query(
                spark,
                "SELECT * FROM text_search('t', '  ', 5)",
                {"t": plain},
            )


class TestTextIndexReviewFindings:
    """Round-13 self-review regressions."""

    def test_duplicate_id_append_refused(self, spark, plain):
        execute_dml(
            spark,
            "CREATE INDEX ON t (doc_id, text) USING INVERTED",
            {"t": plain},
        )
        # re-use an EXISTING doc id in an appended file: the split
        # tf/df would silently diverge from the inline BM25
        from iceberg_file_writer_spark.ingest.snapshots import commit_append

        commit_append(
            spark,
            spark.createDataFrame(
                [(5, "spark window")], "doc_id bigint, text string"
            ).coalesce(1),
            plain,
            max_rows=10,
        )
        with pytest.raises(ValueError, match="non-unique id"):
            execute_dml(
                spark,
                "CREATE INDEX ON t (doc_id, text) USING INVERTED",
                {"t": plain},
            )

    def test_retired_generation_reclaimed_by_append_refresh(
        self, spark, tmp_path
    ):
        import random as _r

        from iceberg_file_writer_spark.ingest.snapshots import commit_append

        rng = _r.Random(5)
        t = str(tmp_path / "t")
        commit_append(
            spark,
            spark.createDataFrame(
                _doc_rows(rng, 60), "doc_id bigint, text string"
            ).coalesce(1),
            t,
            max_rows=30,
        )
        ddl = "CREATE INDEX ON t (doc_id, text) USING INVERTED"
        execute_dml(spark, ddl, {"t": t})
        execute_dml(spark, "DELETE FROM t WHERE doc_id % 2 = 0", {"t": t})
        execute_dml(spark, ddl, {"t": t})  # rebuild -> retires gen A
        assert read_text_index_meta(t)["retired"]
        commit_append(
            spark,
            spark.createDataFrame(
                _doc_rows(rng, 10, start=5000), "doc_id bigint, text string"
            ).coalesce(1),
            t,
            max_rows=30,
        )
        execute_dml(spark, ddl, {"t": t})  # appends-only refresh
        meta = read_text_index_meta(t)
        assert meta["retired"] == []  # grace cycle over, reclaimed
        live = {s["dir"].split("/", 1)[1] for s in meta["segments"]}
        import os as _os

        on_disk = set(_os.listdir(_os.path.join(t, "_text_index", "segments")))
        assert on_disk == live

    def test_empty_table_probe_keeps_id_type(self, spark):
        # empty MAPPED table (the supported empty-table shape: schema
        # synthesized from the mapping) — the probe's id column must
        # keep the declared type, not collapse to string
        wh = tempfile.mkdtemp(prefix="txte-")
        execute_script(
            spark,
            """
            CREATE TABLE et (doc_id BIGINT, text STRING);
            CREATE INDEX ON et (doc_id, text) USING INVERTED;
            """,
            catalog=wh,
        )
        df = execute_query(
            spark,
            "SELECT * FROM text_search('et', 'spark', 5)",
            catalog=wh,
        )
        assert dict(df.dtypes)["doc_id"] == "bigint"  # not string
        assert df.count() == 0
