"""Search/runtime-filter/centrality operators: the persisted inverted
index must be a pure materialization (probe == inline query), the bloom
runtime filter must have no false negatives and a tiny false-positive
rate, and the probe plans must keep their broadcast/pruning posture."""

from __future__ import annotations

import pytest

import contextlib
import io

from pyspark.sql import functions as F

from iceberg_file_writer_spark.operators.inverted_index import (
    build_inverted_index,
    conjunctive_search_index,
)
from iceberg_file_writer_spark.queries import all_queries
from iceberg_file_writer_spark.queries.search_ext import (
    BLOOM_K,
    SEARCH_TERMS,
    SEARCH_TOP_K,
    bloom_build,
)
from iceberg_file_writer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_index_probe_equals_inline_search(spark, tmp_path):
    idx = str(tmp_path / "inverted-index")
    build_inverted_index(spark, SF_DIR, idx)
    probe = conjunctive_search_index(spark, idx, SEARCH_TERMS, SEARCH_TOP_K)
    inline = all_queries()["conjunctive_token_search"].fn(spark, SF_DIR)
    got = sorted((r.doc_id, round(r.score, 9)) for r in probe.collect())
    want = sorted((r.doc_id, round(r.score, 9)) for r in inline.collect())
    assert got == want and len(got) == SEARCH_TOP_K


def test_index_probe_prunes_term_buckets(spark, tmp_path):
    """The probe must read only the probed terms' bucket partitions and
    push the term filter into the parquet scan — document text is never
    touched and untouched buckets are never listed."""
    idx = str(tmp_path / "inverted-index2")
    build_inverted_index(spark, SF_DIR, idx)
    p = _plan(conjunctive_search_index(spark, idx, SEARCH_TERMS, SEARCH_TOP_K))
    assert "PartitionFilters" in p and "term_bucket" in p, p
    assert "PushedFilters: [In(term" in p.replace("\n", " ") or "In(term," in p, p
    assert p.count("BroadcastExchange") >= 2, p  # df relation + n_docs header


def test_bloom_no_false_negatives_and_low_fp(spark):
    t = load_tables(spark, SF_DIR)
    urgent = (
        t["orders"]
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    bloom = bloom_build(urgent, "o_custkey").collect()
    words = {r.word_idx: r.word for r in bloom}
    true_keys = {r.o_custkey for r in urgent.collect()}
    all_keys = {r.c_custkey for r in t["customer"].select("c_custkey").collect()}

    import hashlib

    def member(k: int) -> bool:
        for i in range(BLOOM_K):
            pos = (
                int(hashlib.md5(f"b{i}:{k}".encode()).hexdigest()[:8], 16) % 65536
            )
            w = words.get(pos // 32, 0)
            if not (w >> (pos % 32)) & 1:
                return False
        return True

    assert all(member(k) for k in true_keys)  # bloom contract: no false negatives
    fps = sum(1 for k in all_keys - true_keys if member(k))
    assert fps <= max(1, len(all_keys) // 100), fps  # ~2e-4 expected fill


def test_bloom_probe_is_broadcast(spark):
    p = _plan(all_queries()["bloom_prefilter_join"].fn(spark, SF_DIR))
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert p.count("BroadcastHashJoin") >= 2, p  # bitset probe + member semi


def test_pagerank_mass_conserved(spark):
    """Fixed-point mass accounting: total score stays within N integer
    floor-losses of SCALE-mass (teleport floor + contribution floors),
    and every node's score is at least the teleport floor."""
    df = all_queries()["user_pagerank"].fn(spark, SF_DIR)
    rows = df.collect()
    n = len(rows)
    total = sum(r.pr_nano for r in rows)
    assert all(r.pr_nano >= 150_000_000 // n for r in rows)
    # dangling + floor losses only ever shrink mass; bounded sanity window
    assert 0.5 * 1_000_000_000 < total <= 1_000_000_000, total


def test_search_topk_avoids_full_sort(spark):
    p = _plan(all_queries()["conjunctive_token_search"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p, p


def test_index_append_equals_full_rebuild(spark, tmp_path):
    """Appending a shard to the standing index must be indistinguishable
    from rebuilding over the full corpus: identical search results and an
    identical lexicon (term -> df)."""
    from iceberg_file_writer_spark.operators.inverted_index import (
        append_to_inverted_index,
        build_inverted_index,
        conjunctive_search_index,
    )
    from iceberg_file_writer_spark.queries.dedup import NEW_BATCH_SPLIT
    from iceberg_file_writer_spark.tables import load_tables

    docs = load_tables(spark, SF_DIR)["documents"]
    full_idx = str(tmp_path / "full")
    build_inverted_index(spark, SF_DIR, full_idx)

    # incremental: build on the old corpus only, then fold in the shard
    inc_idx = str(tmp_path / "inc")
    old_dir = str(tmp_path / "old-docs")
    docs.where(F.col("doc_id") < NEW_BATCH_SPLIT).write.parquet(
        old_dir + "/documents.parquet"
    )
    # the builder only touches documents, so a dir holding just that
    # table works as the "old corpus" sf_dir
    build_inverted_index(spark, old_dir, inc_idx)
    append_to_inverted_index(
        spark, docs.where(F.col("doc_id") >= NEW_BATCH_SPLIT), inc_idx
    )

    res_full = sorted(
        (r.doc_id, round(r.score, 9))
        for r in conjunctive_search_index(spark, full_idx, SEARCH_TERMS).collect()
    )
    res_inc = sorted(
        (r.doc_id, round(r.score, 9))
        for r in conjunctive_search_index(spark, inc_idx, SEARCH_TERMS).collect()
    )
    assert res_full == res_inc and len(res_full) == SEARCH_TOP_K

    lex_full = sorted(
        map(tuple, spark.read.parquet(full_idx + "/lexicon").collect())
    )
    lex_inc = sorted(map(tuple, spark.read.parquet(inc_idx + "/lexicon").collect()))
    assert lex_full == lex_inc
    n_full = spark.read.parquet(full_idx + "/meta").collect()[0].n_docs
    n_inc = spark.read.parquet(inc_idx + "/meta").collect()[0].n_docs
    assert n_full == n_inc


def test_triangle_count_plan_has_no_cartesian(spark):
    p = _plan(all_queries()["user_triangle_count"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert p.count("BroadcastHashJoin") >= 2, p  # degree relations broadcast


def test_source_overlap_pairs_only_rare_shingles(spark):
    """The pair self-join must run on the rare-filtered relation, not raw
    postings — the joins stay equi-joins and nothing goes cartesian."""
    p = _plan(all_queries()["source_shingle_overlap"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_hybrid_search_broadcasts_query_embedding(spark):
    p = _plan(all_queries()["hybrid_search_rrf"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in p, p
    assert p.count("BroadcastExchange") >= 3, p  # df rel, n_docs, query vec


def test_priority_sample_avoids_full_sort(spark):
    p = _plan(all_queries()["doc_priority_sample"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p, p
    assert "Exchange hashpartitioning" not in p, p  # one scan, no shuffle


def test_index_append_recovers_crashed_swap(spark, tmp_path):
    """The lexicon/meta swap is two renames; append must heal every crash
    state at entry — .old with nothing live (restore), .old beside live
    (drop), stranded .tmp (drop) — and still fold the shard so the
    result equals a full rebuild (ADVICE r5: inverted_index.py swap)."""
    import os
    import shutil

    from iceberg_file_writer_spark.operators.inverted_index import (
        append_to_inverted_index,
    )
    from iceberg_file_writer_spark.queries.dedup import NEW_BATCH_SPLIT

    docs = load_tables(spark, SF_DIR)["documents"]
    full_idx = str(tmp_path / "full")
    build_inverted_index(spark, SF_DIR, full_idx)

    inc_idx = str(tmp_path / "inc")
    old_dir = str(tmp_path / "old-docs")
    docs.where(F.col("doc_id") < NEW_BATCH_SPLIT).write.parquet(
        old_dir + "/documents.parquet"
    )
    build_inverted_index(spark, old_dir, inc_idx)

    # crash state: lexicon mid-swap (live renamed aside, new not yet in),
    # meta with a committed swap whose .old lingered, plus stranded .tmps
    os.rename(inc_idx + "/lexicon", inc_idx + "/lexicon.old")
    shutil.copytree(inc_idx + "/meta", inc_idx + "/meta.old")
    shutil.copytree(inc_idx + "/meta", inc_idx + "/lexicon.tmp")

    append_to_inverted_index(
        spark, docs.where(F.col("doc_id") >= NEW_BATCH_SPLIT), inc_idx
    )
    for leftover in ("lexicon.old", "meta.old", "lexicon.tmp", "meta.tmp"):
        assert not os.path.exists(f"{inc_idx}/{leftover}")

    res_full = sorted(
        (r.doc_id, round(r.score, 9))
        for r in conjunctive_search_index(spark, full_idx, SEARCH_TERMS).collect()
    )
    res_inc = sorted(
        (r.doc_id, round(r.score, 9))
        for r in conjunctive_search_index(spark, inc_idx, SEARCH_TERMS).collect()
    )
    assert res_full == res_inc


@pytest.mark.slow  # injected-crash sweep, minutes: excluded from the
# default run (pytest.ini); run with -m slow before shipping changes here
def test_index_append_atomic_across_injected_crashes(spark, tmp_path):
    """Crash-inject the commit phase at every rename step: recovery must
    roll the append FORWARD (marker present => staged state is complete),
    and a caller retry with the same shard_id must be a no-op — the
    index always ends byte-identical to the full rebuild (code-review
    find r6: postings/lexicon/meta tear + double-fold on retry)."""
    import os

    from iceberg_file_writer_spark.operators import inverted_index as II
    from iceberg_file_writer_spark.queries.dedup import NEW_BATCH_SPLIT
    from iceberg_file_writer_spark.tables import load_tables

    docs = load_tables(spark, SF_DIR)["documents"]
    full_idx = str(tmp_path / "full")
    build_inverted_index(spark, SF_DIR, full_idx)
    old_docs = docs.where(F.col("doc_id") < NEW_BATCH_SPLIT)
    shard = docs.where(F.col("doc_id") >= NEW_BATCH_SPLIT)
    old_dir = str(tmp_path / "old-docs")
    old_docs.write.parquet(old_dir + "/documents.parquet")

    def canon(idx):
        res = sorted(
            (r.doc_id, round(r.score, 9))
            for r in conjunctive_search_index(spark, idx, SEARCH_TERMS).collect()
        )
        lex = sorted(map(tuple, spark.read.parquet(idx + "/lexicon").collect()))
        n = spark.read.parquet(idx + "/meta").collect()[0].n_docs
        return res, lex, n

    want = canon(full_idx)

    crash_at = 0
    while True:
        crash_at += 1
        idx = str(tmp_path / f"inc{crash_at}")
        build_inverted_index(spark, old_dir, idx)
        real_rename = os.rename
        calls = {"n": 0, "crashed": False}

        def exploding(src, dst):
            # only meter renames inside the index commit phase
            if str(src).startswith(idx):
                calls["n"] += 1
                if calls["n"] == crash_at:
                    calls["crashed"] = True
                    raise OSError("injected crash")
            return real_rename(src, dst)

        os.rename = exploding
        try:
            II.append_to_inverted_index(spark, shard, idx, shard_id="s1")
        except OSError:
            pass
        finally:
            os.rename = real_rename
        # caller retry with the same shard id
        II.append_to_inverted_index(spark, shard, idx, shard_id="s1")
        assert canon(idx) == want, f"crash_at={crash_at}"
        if not calls["crashed"]:
            break  # commit completed before the injection point: done
    assert crash_at > 3  # the sweep actually exercised several windows


def test_kcore_converges_inside_oracle_unroll(spark):
    """The oracle unrolls KCORE_ORACLE_UNROLL peel rounds; the Spark
    fixpoint must converge within that bound at every test SF or the
    unroll constant needs raising (parity would break loudly too —
    this pins the margin)."""
    from iceberg_file_writer_spark.queries.search_ext import (
        KCORE_ORACLE_UNROLL,
        user_kcore_membership,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        user_kcore_membership(spark, sf).count()
        assert user_kcore_membership.last_rounds <= KCORE_ORACLE_UNROLL - 2


def test_kcore_local_and_distributed_peels_agree(spark, monkeypatch):
    """The adaptive peel (driver-local when the thresholded edge relation
    fits, distributed rounds above the cap) must produce IDENTICAL
    (user_id, core_degree) rows either way — the distributed path is the
    100 TB path and must stay exercised."""
    import iceberg_file_writer_spark.queries.search_ext as se

    sf = "/root/testdata/sf0.01"
    local = sorted(tuple(r) for r in se.user_kcore_membership(spark, sf).collect())
    monkeypatch.setattr(se, "KCORE_LOCAL_EDGES", -1)  # force distributed
    dist = sorted(tuple(r) for r in se.user_kcore_membership(spark, sf).collect())
    assert local == dist and len(local) > 0


def _physical_nodes(df) -> list[str]:
    """Detail-section node names from explain('formatted'): one
    '(n) NodeName' header per physical node."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return [
        line.split(") ", 1)[-1].strip()
        for line in buf.getvalue().splitlines()
        if line.startswith("(") and ") " in line
    ]


def test_funnel_plan_one_scan_two_exchanges_and_monotone(spark):
    """Gate on the REGISTERED entry's own plan (VERDICT r9 item 2 — the
    old gate pinned a hand-rebuilt sub-phase and let a 25.7 s pathology
    ship): exactly ONE events scan with the funnel-type IN filter
    pushed, exactly TWO exchanges (per-user hash + final single
    partition), and NO Union — the r9 4-branch union re-scanned the
    per-user relation per step. Step counts stay monotone."""
    import contextlib
    import io

    from iceberg_file_writer_spark.queries.events import (
        user_conversion_funnel,
    )

    df = user_conversion_funnel(spark, "/root/testdata/sf0.001")
    # explain BEFORE executing: post-collect, AQE prints Final+Initial
    # plans and every Exchange shows up twice
    nodes = _physical_nodes(df)
    scans = [n for n in nodes if n.startswith("Scan parquet")]
    exchanges = [n for n in nodes if n.startswith("Exchange")]
    unions = [n for n in nodes if n.startswith("Union")]
    assert len(scans) == 1, nodes
    assert len(exchanges) == 2, nodes
    assert not unions, nodes
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [In(event_type" in plan, plan
    # the ONLY data shuffle is the per-user hash; the second exchange
    # is the 1-row-per-partial final aggregate
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert "SinglePartition" in plan, plan
    rows = {r.step_idx: r.n_users for r in df.collect()}
    assert all(rows[i] >= rows[i + 1] for i in range(1, len(rows)))
    assert rows[1] > 0


def test_funnel_hot_user_cap(spark, tmp_path, monkeypatch):
    """FUNNEL_EVENT_CAP bounds the per-user array (VERDICT r9 item 8):
    a hot user beyond the cap degrades to "funnel over their first cap
    funnel-type events" — deterministically, engine and oracle alike —
    instead of an unbounded collect_list blowing a task at 100x scale."""
    import duckdb
    import pandas as pd

    import iceberg_file_writer_spark.queries.events as ev_mod
    from oracle_utils import assert_parity

    base = pd.Timestamp("2024-01-01 00:00:00")

    def mk(user, offsets_types):
        return [
            {
                "event_id": i,
                "user_id": user,
                "ts": base + pd.Timedelta(seconds=off),
                "event_type": et,
            }
            for i, (off, et) in enumerate(offsets_types)
        ]

    rows = (
        # hot user: completes the funnel only at event #4 — beyond cap 3
        mk(1, [(0, "signup"), (1, "view"), (2, "click"), (3, "purchase"),
               (4, "view"), (5, "click")])
        # normal user: completes within the cap
        + mk(2, [(0, "signup"), (10, "view"), (20, "click")])
    )
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet", index=False)

    monkeypatch.setattr(ev_mod, "FUNNEL_EVENT_CAP", 3)
    result = ev_mod.user_conversion_funnel(spark, str(tmp_path))
    got = {r.step_idx: r.n_users for r in result.collect()}
    # cap=3 truncates user 1 at the click; nobody reaches purchase
    assert got == {1: 2, 2: 2, 3: 2, 4: 0}, got

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    assert_parity(result, con, ev_mod._funnel_oracle(), name="funnel-capped")


def test_adamic_adar_topm_pinned_against_exact(spark):
    """The constant-budget variant is an exact partial sum of the
    uncapped score: with an unbinding budget it EQUALS the exact
    entry's output; with the shipped budget every pair's n_common and
    aa_score are monotone under-estimates of the uncapped values."""
    from iceberg_file_writer_spark.queries import search_ext as se
    from iceberg_file_writer_spark.queries.search_ext import (
        _adamic_adar_scored,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        (r.user_a, r.user_b): (r.n_common, r.aa_score, r.linked)
        for r in se.user_adamic_adar_links(spark, sf).collect()
    }
    # budget so large it never binds, adaptive cap OFF on both sides:
    # compare against an uncapped run of the shared pipeline
    uncapped = {
        (r.user_a, r.user_b): (r.n_common, r.aa_score, r.linked)
        for r in _adamic_adar_scored(spark, sf, top_m=10**9).collect()
    }
    # the exact entry applies the adaptive middle-degree cap, so it is
    # itself a subset of the uncapped run with <= counts
    for pair, (nc, sc, _l) in exact.items():
        assert pair in uncapped
        unc, usc, _ = uncapped[pair]
        assert nc <= unc and sc <= usc + 1e-6

    shipped = {
        (r.user_a, r.user_b): (r.n_common, r.aa_score, r.linked)
        for r in se.user_adamic_adar_topm(spark, sf).collect()
    }
    assert shipped  # budget does not empty the result at test SF
    for pair, (nc, sc, linked) in shipped.items():
        assert pair in uncapped  # never invents a pair
        unc, usc, ulinked = uncapped[pair]
        assert nc <= unc  # monotone under-estimate (wedge subset)
        assert sc <= usc + 1e-6
        assert linked == ulinked  # the observed-edge flag is exact
