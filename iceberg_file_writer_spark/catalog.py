"""Warehouse catalog: durable table-name resolution for the SQL surface
[extension — not in reference].

``execute_dml``/``execute_query`` historically took a ``tables={name:
path}`` dict per call — nothing survived the call, and CREATE TABLE
registered nowhere. This module is the plumbing that makes the
statement surface feel like a database: a warehouse directory owns a
``catalog.json`` mapping table names to directories, CREATE/DROP
maintain it, and any statement can then address tables by bare name —
across calls, sessions, and processes.

Design, deliberately file-native like the rest of the storage layer:

- ``catalog.json`` lives at the warehouse root and maps ``name ->
  relative directory`` (relative, so the whole warehouse relocates with
  a ``mv``). Updates go through the same atomic tmp+rename publish the
  snapshot ledgers use — readers see the old or the new catalog, never
  a torn file.
- Registration is NAME metadata only. The table's own transactional
  state (manifests, CURRENT) stays entirely inside its directory; a
  crash between directory creation and registration leaves an
  unregistered directory (re-CREATE reuses it only after an explicit
  ``register``), never a broken catalog.
- Concurrency posture: updates are read-modify-write with an atomic
  publish — readers never see a torn document, but two SIMULTANEOUS
  registrations can last-writer-win (one binding lost). Table DATA is
  never at risk (the tables' own optimistic commits are the
  correctness layer); catalog writes are rare human-scale DDL. A
  multi-writer deployment would put the O_EXCL ledger protocol here.
- ``tables={...}`` remains a per-call OVERRIDE everywhere: explicit
  paths shadow catalog names, so tests and ad-hoc joins keep working
  unchanged.

At 100 TB the catalog is pure metadata — one JSON document per
warehouse, read once per statement; resolution cost never scales with
table count beyond the document parse (memoized per Catalog instance
per mtime).

Reference scope note: the reference (/root/reference/main.go:47-54)
hard-codes one output directory per process; this is the multi-table
naming layer its write path never needed. [extension]
"""

from __future__ import annotations

import json
import os
import re

from iceberg_file_writer_spark.ingest.ledger import write_atomic

_CATALOG = "catalog.json"
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class Catalog:
    """Name -> table-directory registry rooted at a warehouse dir."""

    def __init__(self, warehouse: str):
        self.warehouse = os.path.abspath(warehouse)
        self._cache: "tuple[float, dict] | None" = None

    def _path(self) -> str:
        return os.path.join(self.warehouse, _CATALOG)

    def _load(self) -> dict:
        p = self._path()
        try:
            mtime = os.path.getmtime(p)
        except OSError:
            return {}
        if self._cache is not None and self._cache[0] == mtime:
            return self._cache[1]
        with open(p) as f:
            doc = json.load(f)
        tables = dict(doc.get("tables") or {})
        self._cache = (mtime, tables)
        return tables

    def _store(self, tables: dict) -> None:
        os.makedirs(self.warehouse, exist_ok=True)
        doc = self._load_doc()
        doc["tables"] = tables
        write_atomic(self._path(), json.dumps(doc, sort_keys=True))
        self._cache = None

    # -- reads ----------------------------------------------------------------

    def names(self) -> list:
        return sorted(self._load())

    def has(self, name: str) -> bool:
        return name in self._load()

    def resolve(self, name: str) -> str:
        tables = self._load()
        if name not in tables:
            raise ValueError(
                f"unknown table {name!r} in warehouse {self.warehouse}; "
                f"known: {sorted(tables)}"
            )
        return os.path.join(self.warehouse, tables[name])

    # -- writes ---------------------------------------------------------------

    def register(self, name: str, path: "str | None" = None) -> str:
        """Bind ``name`` to a table directory (default: a fresh
        ``<warehouse>/<name>``); returns the absolute path. Re-binding
        an existing name to a DIFFERENT directory is refused — DROP
        first (a silent rebind would orphan the old data)."""
        if not _NAME_RE.match(name):
            raise ValueError(f"invalid table name: {name!r}")
        if name in (self._load_doc().get("views") or {}):
            raise ValueError(f"{name!r} is already a VIEW in this warehouse")
        tables = self._load()
        rel = (
            os.path.relpath(os.path.abspath(path), self.warehouse)
            if path is not None
            else name
        )
        if name in tables:
            if tables[name] != rel:
                raise ValueError(
                    f"table {name!r} is already registered at "
                    f"{tables[name]!r}; DROP it before re-binding"
                )
            return os.path.join(self.warehouse, rel)
        tables = dict(tables)
        tables[name] = rel
        self._store(tables)
        return os.path.join(self.warehouse, rel)

    def slot(self, name: str) -> str:
        """The path ``register(name)`` WOULD bind — no mutation. Lets
        CREATE check target existence before durably binding the name
        (a failed CTAS must not leave a binding to data it refused to
        create)."""
        if not _NAME_RE.match(name):
            raise ValueError(f"invalid table name: {name!r}")
        tables = self._load()
        if name in tables:
            return os.path.join(self.warehouse, tables[name])
        return os.path.join(self.warehouse, name)

    def unregister(self, name: str) -> None:
        tables = self._load()
        if name in tables:
            tables = dict(tables)
            del tables[name]
            self._store(tables)

    # -- durable views ----------------------------------------------------------
    # A view is stored SQL text, re-planned at every reference (the
    # classic non-materialized view): it rides in the same catalog.json
    # document under "views" and resolves through execute_query, so a
    # view can reference catalog tables, other views, and time travel.

    def _load_doc(self) -> dict:
        try:
            with open(self._path()) as f:
                return json.load(f)
        except OSError:
            return {}

    def view_names(self) -> list:
        return sorted(self._load_doc().get("views") or {})

    def view_sql(self, name: str) -> str:
        views = self._load_doc().get("views") or {}
        if name not in views:
            raise ValueError(
                f"unknown view {name!r} in warehouse {self.warehouse}; "
                f"known: {sorted(views)}"
            )
        return views[name]

    def register_view(self, name: str, sql: str) -> None:
        if not _NAME_RE.match(name):
            raise ValueError(f"invalid view name: {name!r}")
        doc = self._load_doc()
        if name in (doc.get("tables") or {}):
            raise ValueError(f"{name!r} is already a TABLE in this warehouse")
        views = dict(doc.get("views") or {})
        views[name] = sql
        doc["views"] = views
        os.makedirs(self.warehouse, exist_ok=True)
        write_atomic(self._path(), json.dumps(doc, sort_keys=True))
        self._cache = None

    def unregister_view(self, name: str) -> None:
        doc = self._load_doc()
        views = dict(doc.get("views") or {})
        if name in views:
            del views[name]
            doc["views"] = views
            write_atomic(self._path(), json.dumps(doc, sort_keys=True))
            self._cache = None


class Scope:
    """Per-statement name resolution: the explicit ``tables`` dict
    first (override), then the warehouse catalog. Quacks like the
    ``tables`` dict the statement executors were built on."""

    def __init__(
        self,
        tables: "dict[str, str] | None",
        catalog: "Catalog | str | None",
    ):
        self.tables = dict(tables or {})
        self.catalog = Catalog(catalog) if isinstance(catalog, str) else catalog

    def __contains__(self, name: str) -> bool:
        return name in self.tables or (
            self.catalog is not None and self.catalog.has(name)
        )

    def __getitem__(self, name: str) -> str:
        if name in self.tables:
            return self.tables[name]
        if self.catalog is not None:
            return self.catalog.resolve(name)
        raise KeyError(name)

    def __iter__(self):
        seen = set(self.tables)
        yield from self.tables
        if self.catalog is not None:
            for n in self.catalog.names():
                if n not in seen:
                    yield n

    def items(self):
        for n in self:
            yield n, self[n]

    def create_path(self, name: str) -> str:
        """Where CREATE TABLE ``name`` should land: the explicit
        override path if given, else a catalog-registered slot."""
        if name in self.tables:
            return self.tables[name]
        if self.catalog is not None:
            return self.catalog.register(name)
        raise ValueError(
            f"unknown snapshot table {name!r}; pass tables={{...}} or a "
            "catalog/warehouse to CREATE by bare name"
        )

    def peek_create_path(self, name: str) -> str:
        """``create_path`` WITHOUT the durable catalog binding: CREATE
        statements check target existence on this first, so a refused
        CREATE never leaves a name bound to data it didn't create."""
        if name in self.tables:
            return self.tables[name]
        if self.catalog is not None:
            return self.catalog.slot(name)
        raise ValueError(
            f"unknown snapshot table {name!r}; pass tables={{...}} or a "
            "catalog/warehouse to CREATE by bare name"
        )

    def on_drop(self, name: str) -> None:
        if name not in self.tables and self.catalog is not None:
            self.catalog.unregister(name)
