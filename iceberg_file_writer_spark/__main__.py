"""CLI — the reference driver's entry surface, Spark-first.

The reference is invoked as ``iceberg-file-writer <inputFile> <outputPath>``
(reference main.go:117-141: argv checks at 120-124, start() at 126,
blocking on Finished at 130, ordered stop() at 138). The rebuild keeps
that surface and adds the query/maintenance verbs the engine grew:

    python -m iceberg_file_writer_spark ingest <input> <output>
        [--streaming] [--format json|parquet] [--partition-col user_id]
        [--key-col timestamp] [--max-rows-per-file 4096]
        [--trigger-seconds 60] [--checkpoint DIR]
    python -m iceberg_file_writer_spark compact <table_path>
    python -m iceberg_file_writer_spark delete <table_path> <keys...>
        [--predicate SQL]
    python -m iceberg_file_writer_spark snapshot-log <table_path>
    python -m iceberg_file_writer_spark time-travel <table_path> [--version N]
    python -m iceberg_file_writer_spark expire-snapshots <table_path>
        [--keep-last N]
    python -m iceberg_file_writer_spark query <name> [--sf-dir DIR]
    python -m iceberg_file_writer_spark list-queries
    python -m iceberg_file_writer_spark sql <statement|-> [--sf-dir DIR]
        [--views name1,name2] [--limit N] [--explain]
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="iceberg_file_writer_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help="ingest a record stream into a partitioned table")
    ing.add_argument("input")
    ing.add_argument("output")
    ing.add_argument("--streaming", action="store_true", help="run as a Structured Streaming query")
    ing.add_argument("--format", default="json", choices=["json", "parquet"])
    ing.add_argument("--partition-col", default="user_id")
    ing.add_argument("--key-col", default="timestamp")
    ing.add_argument("--max-rows-per-file", type=int, default=4096)
    ing.add_argument("--compression", default="snappy")
    ing.add_argument("--trigger-seconds", type=int, default=60)
    ing.add_argument("--checkpoint", default=None)

    comp = sub.add_parser("compact", help="rewrite a table's files preserving layout invariants")
    comp.add_argument("table_path")
    comp.add_argument("--partition-col", default="user_id")
    comp.add_argument("--key-col", default="timestamp")
    comp.add_argument("--target-rows-per-file", type=int, default=None)

    dele = sub.add_parser(
        "delete", help="targeted copy-on-write delete (GDPR/retention)"
    )
    dele.add_argument("table_path")
    dele.add_argument("keys", nargs="+", help="partition-column values to target")
    dele.add_argument("--predicate", default=None, help="SQL condition; omit to drop whole partitions")
    dele.add_argument("--partition-col", default="user_id")
    dele.add_argument("--key-col", default="timestamp")

    slog = sub.add_parser("snapshot-log", help="list a snapshot table's versions")
    slog.add_argument("table_path")

    tt = sub.add_parser("time-travel", help="show a snapshot table at a version")
    tt.add_argument("table_path")
    tt.add_argument("--version", type=int, default=None)
    tt.add_argument("--limit", type=int, default=20)

    chg = sub.add_parser(
        "changes", help="row-level change feed between two snapshot versions"
    )
    chg.add_argument("table_path")
    chg.add_argument("from_version", type=int)
    chg.add_argument("to_version", type=int)
    chg.add_argument("--limit", type=int, default=20)

    exp = sub.add_parser("expire-snapshots", help="drop unreferenced history")
    exp.add_argument("table_path")
    exp.add_argument("--keep-last", type=int, default=2)

    vac = sub.add_parser(
        "vacuum", help="expire history + sweep DV/eq/bloom sidecars (one call)"
    )
    vac.add_argument("table_path")
    vac.add_argument("--keep-last", type=int, default=2)
    vac.add_argument("--grace-seconds", type=int, default=3600)

    tag = sub.add_parser("tag", help="create/delete/list snapshot tags")
    tag.add_argument("table_path")
    tag.add_argument("--create", metavar="NAME")
    tag.add_argument("--version", type=int, default=None)
    tag.add_argument("--delete", metavar="NAME")

    insp = sub.add_parser(
        "inspect",
        help="metadata tables: snapshots/files/history/partitions/refs/"
        "stats (+ clustering)",
    )
    insp.add_argument("table_path")
    from iceberg_file_writer_spark.ingest.inspect import KINDS as _KINDS

    insp.add_argument(
        "kind",
        # derived from the module's registry so a new kind can never
        # silently drift out of the CLI (review finding)
        choices=[*_KINDS, "clustering"],
    )
    insp.add_argument("--version", type=int, default=None)
    insp.add_argument("--limit", type=int, default=50)

    q = sub.add_parser("query", help="run a registered query and show the result")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--explain", action="store_true")

    sub.add_parser("list-queries", help="list registered queries")

    sq = sub.add_parser(
        "sql",
        help="run ad-hoc SQL over the testdata views (tables by name, "
        "registered queries as q_<name>)",
    )
    sq.add_argument("statement", help="SQL text, or '-' to read stdin")
    sq.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sq.add_argument(
        "--views",
        default=None,
        help="comma-separated query names to expose as q_<name> views "
        "(default: all batch entries)",
    )
    sq.add_argument("--limit", type=int, default=20)
    sq.add_argument("--explain", action="store_true")

    dml = sub.add_parser(
        "dml",
        help="run one DML/DDL statement against snapshot tables "
        "(DELETE/UPDATE/INSERT/MERGE/CREATE/ALTER/OPTIMIZE [ZORDER]/"
        "ANALYZE/VACUUM — sql_dml grammar, both table flavors)",
    )
    dml.add_argument("statement", help="DML text, or '-' to read stdin")
    dml.add_argument(
        "--table",
        action="append",
        default=None,
        metavar="NAME=PATH",
        help="bind a statement table name to a snapshot-table path "
        "(repeatable; overrides --warehouse names)",
    )
    dml.add_argument(
        "--warehouse",
        default=None,
        help="warehouse directory with a durable name catalog "
        "(catalog.json): CREATE registers, DROP unregisters, bare "
        "names resolve across invocations",
    )
    dml.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.001",
        help="testdata views for INSERT/MERGE source queries",
    )

    tq = sub.add_parser(
        "tsql",
        help="run a SELECT over snapshot tables with time-travel syntax "
        "(FROM t VERSION AS OF n / TIMESTAMP AS OF ts)",
    )
    tq.add_argument("statement", help="SQL text, or '-' to read stdin")
    tq.add_argument(
        "--table",
        action="append",
        default=None,
        metavar="NAME=PATH",
        help="bind a statement table name to a snapshot-table path "
        "(repeatable; overrides --warehouse names)",
    )
    tq.add_argument(
        "--warehouse",
        default=None,
        help="warehouse directory with a durable name catalog",
    )
    tq.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    tq.add_argument("--limit", type=int, default=20)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from iceberg_file_writer_spark.session import get_spark

    if args.cmd == "list-queries":
        from iceberg_file_writer_spark.queries import all_queries

        for name, q in sorted(all_queries().items()):
            oracle = "oracle" if q.oracle else "rows-only"
            print(f"{name:36s} [{oracle}] {q.description}")
        return 0

    spark = get_spark("iceberg_file_writer_spark-cli")

    if args.cmd == "ingest":
        from iceberg_file_writer_spark.ingest.batch import (
            IngestConfig,
            ingest_batch,
            read_source,
        )

        cfg = IngestConfig(
            partition_column=args.partition_col,
            key_column=args.key_col,
            max_rows_per_file=args.max_rows_per_file,
            compression=args.compression,
        )
        if args.streaming:
            from iceberg_file_writer_spark.ingest.streaming import ingest_stream_once

            ckpt = args.checkpoint or (args.output.rstrip("/") + ".checkpoint")
            ingest_stream_once(
                spark, args.input, args.output, ckpt, cfg=cfg, source_format=args.format
            )
        else:
            ingest_batch(read_source(spark, args.input, source_format=args.format), args.output, cfg)
        print(f"ingested {args.input} -> {args.output}")
        return 0

    if args.cmd == "compact":
        from iceberg_file_writer_spark.ingest.batch import IngestConfig
        from iceberg_file_writer_spark.ingest.maintenance import compact_table, list_data_files

        cfg = IngestConfig(partition_column=args.partition_col, key_column=args.key_col)
        before = len(list_data_files(args.table_path))
        compact_table(spark, args.table_path, cfg, args.target_rows_per_file)
        after = len(list_data_files(args.table_path))
        print(f"compacted {args.table_path}: {before} -> {after} files")
        return 0

    if args.cmd == "delete":
        from iceberg_file_writer_spark.ingest.batch import IngestConfig
        from iceberg_file_writer_spark.ingest.maintenance import apply_deletes

        cfg = IngestConfig(partition_column=args.partition_col, key_column=args.key_col)
        stats = apply_deletes(
            spark, args.table_path, args.keys, cfg, predicate=args.predicate
        )
        print(stats)
        return 0

    if args.cmd == "snapshot-log":
        from iceberg_file_writer_spark.ingest.snapshots import snapshot_log

        for s in snapshot_log(args.table_path):
            print(
                f"v{s['version']:06d} {s['op']:8s} "
                f"{s['n_files']:5d} files {s['n_rows']:10d} rows"
            )
        return 0

    if args.cmd == "time-travel":
        from iceberg_file_writer_spark.ingest.snapshots import read_table_version

        read_table_version(spark, args.table_path, args.version).show(
            args.limit, truncate=60
        )
        return 0

    if args.cmd == "changes":
        from iceberg_file_writer_spark.ingest.snapshots import changes_between

        changes_between(
            spark, args.table_path, args.from_version, args.to_version
        ).show(args.limit, truncate=60)
        return 0

    if args.cmd == "expire-snapshots":
        from iceberg_file_writer_spark.ingest.snapshots import expire_snapshots

        print(expire_snapshots(args.table_path, keep_last=args.keep_last))
        return 0

    if args.cmd == "vacuum":
        from iceberg_file_writer_spark.ingest.maintenance import vacuum

        print(
            vacuum(
                args.table_path,
                keep_last=args.keep_last,
                grace_seconds=args.grace_seconds,
            )
        )
        return 0

    if args.cmd == "tag":
        from iceberg_file_writer_spark.ingest import tags as tags_mod

        if args.create:
            v = tags_mod.create_tag(args.table_path, args.create, args.version)
            print(f"tagged v{v} as {args.create!r}")
        elif args.delete:
            tags_mod.delete_tag(args.table_path, args.delete)
            print(f"deleted tag {args.delete!r}")
        else:
            for name, t in tags_mod.list_tags(args.table_path).items():
                print(f"{name:24s} v{t['version']:06d}")
        return 0

    if args.cmd == "inspect":
        if args.kind == "clustering":
            from iceberg_file_writer_spark.ingest.inspect import clustering_report

            print(clustering_report(args.table_path, args.version))
            return 0
        from iceberg_file_writer_spark.ingest.inspect import inspect_table

        inspect_table(spark, args.table_path, args.kind, args.version).show(
            args.limit, truncate=60
        )
        return 0

    if args.cmd == "sql":
        from iceberg_file_writer_spark.tables import create_views

        stmt = sys.stdin.read() if args.statement == "-" else args.statement
        # --views '' = base tables only; omitted = all batch entries
        names = (
            [n for n in args.views.split(",") if n]
            if args.views is not None
            else None
        )
        try:
            create_views(spark, args.sf_dir, query_names=names)
        except ValueError as e:
            print(str(e), file=sys.stderr)
            return 2
        df = spark.sql(stmt)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=60)
        return 0

    if args.cmd == "tsql":
        from iceberg_file_writer_spark.sql_dml import execute_query
        from iceberg_file_writer_spark.tables import load_tables

        stmt = sys.stdin.read() if args.statement == "-" else args.statement
        tables = {}
        for binding in args.table or []:
            name, eq, path = binding.partition("=")
            if not eq or not name or not path:
                print(f"malformed --table binding: {binding!r}", file=sys.stderr)
                return 2
            tables[name] = path
        if not tables and not args.warehouse:
            print("pass --table NAME=PATH and/or --warehouse DIR", file=sys.stderr)
            return 2
        load_tables(spark, args.sf_dir)
        try:
            df = execute_query(spark, stmt, tables, catalog=args.warehouse)
        except ValueError as e:
            print(str(e), file=sys.stderr)
            return 2
        df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "dml":
        from iceberg_file_writer_spark.sql_dml import execute_dml
        from iceberg_file_writer_spark.tables import load_tables

        stmt = sys.stdin.read() if args.statement == "-" else args.statement
        tables = {}
        for binding in args.table or []:
            name, eq, path = binding.partition("=")
            if not eq or not name or not path:
                print(f"malformed --table binding: {binding!r}", file=sys.stderr)
                return 2
            tables[name] = path
        if not tables and not args.warehouse:
            print("pass --table NAME=PATH and/or --warehouse DIR", file=sys.stderr)
            return 2
        load_tables(spark, args.sf_dir)  # views for statement sources
        try:
            out = execute_dml(spark, stmt, tables, catalog=args.warehouse)
        except ValueError as e:
            print(str(e), file=sys.stderr)
            return 2
        print(out)
        return 0

    if args.cmd == "query":
        from iceberg_file_writer_spark.queries import all_queries

        queries = all_queries()
        if args.name not in queries:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        df = queries[args.name].fn(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=60)
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
