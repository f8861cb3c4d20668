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
- Concurrency posture (r12, mechanism fixed r14): every mutation is
  read-modify-write under a kernel ``flock`` on a persistent
  ``catalog.json.lock`` file (a crashed holder's lock releases
  automatically — no stale-mtime steal heuristics), so simultaneous
  registrations SERIALIZE — no binding is ever lost to a
  last-writer-win race. Readers never take the lock; the atomic
  tmp+rename publish already gives them untorn documents.
  DROP TABLE refuses (without CASCADE) when a durable view's SQL
  references the name — no silently dangling views.
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

import contextlib
import json
import os
import re
import time

from iceberg_file_writer_spark.ingest.ledger import write_atomic

_CATALOG = "catalog.json"
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
# catalog mutations are microsecond JSON rewrites; a lock older than
# this belongs to a crashed holder and is stolen
_LOCK_TTL_S = 10.0


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

    @contextlib.contextmanager
    def _locked(self):
        """Mutation lock (r11 missing #4): every catalog write is
        read-modify-write under this claim, so two simultaneous
        registrations serialize instead of last-writer-winning (one
        binding silently lost). Readers never take the lock — the
        atomic tmp+rename publish already gives them untorn documents.

        Kernel ``flock`` on a persistent lock file (r14 fix): the old
        O_EXCL + mtime-TTL steal had a non-atomic check-then-rename —
        a waiter that observed a stale mtime could rename away the
        FRESH lock another waiter had just legitimately re-created,
        admitting two mutators (observed as a ~10% flake in the
        concurrent-steal test: the two writers raced write_atomic's
        tmp rename, and a binding could be silently lost). flock is
        owned by the kernel: exactly one fd holds LOCK_EX, a crashed
        holder's lock releases automatically (strictly better than the
        TTL heuristic), and there is nothing on disk to steal or
        litter. The lock FILE deliberately persists and is never
        unlinked — unlinking would let a late opener lock the deleted
        inode while a new creator locks a fresh one, breaking mutual
        exclusion (the classic flock-unlink pitfall). ``_LOCK_TTL_S``
        remains the busy-wait bound against a LIVE holder."""
        import fcntl

        os.makedirs(self.warehouse, exist_ok=True)
        lock = self._path() + ".lock"
        deadline = time.monotonic() + _LOCK_TTL_S
        fd = os.open(lock, os.O_CREAT | os.O_RDWR)
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except OSError:
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            f"catalog mutation lock busy for {_LOCK_TTL_S}s: "
                            f"{lock} — its holder is alive (a crashed "
                            "holder's flock releases automatically)"
                        )
                    time.sleep(0.01)
            try:
                yield
            finally:
                with contextlib.suppress(OSError):
                    fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)

    def _publish_doc(self, doc: dict) -> None:
        os.makedirs(self.warehouse, exist_ok=True)
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
        rel = (
            os.path.relpath(os.path.abspath(path), self.warehouse)
            if path is not None
            else name
        )
        with self._locked():
            doc = self._load_doc()  # fresh under the claim
            if name in (doc.get("views") or {}):
                raise ValueError(
                    f"{name!r} is already a VIEW in this warehouse"
                )
            if name in (doc.get("mviews") or {}):
                raise ValueError(
                    f"{name!r} is already a MATERIALIZED VIEW in this "
                    "warehouse"
                )
            tables = dict(doc.get("tables") or {})
            if name in tables:
                if tables[name] != rel:
                    raise ValueError(
                        f"table {name!r} is already registered at "
                        f"{tables[name]!r}; DROP it before re-binding"
                    )
                return os.path.join(self.warehouse, rel)
            tables[name] = rel
            doc["tables"] = tables
            self._publish_doc(doc)
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
        with self._locked():
            doc = self._load_doc()
            tables = dict(doc.get("tables") or {})
            if name in tables:
                del tables[name]
                doc["tables"] = tables
                self._publish_doc(doc)

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
        with self._locked():
            doc = self._load_doc()
            if name in (doc.get("tables") or {}):
                raise ValueError(
                    f"{name!r} is already a TABLE in this warehouse"
                )
            if name in (doc.get("mviews") or {}):
                raise ValueError(
                    f"{name!r} is already a MATERIALIZED VIEW in this "
                    "warehouse"
                )
            views = dict(doc.get("views") or {})
            views[name] = sql
            doc["views"] = views
            self._publish_doc(doc)

    def unregister_view(self, name: str) -> None:
        with self._locked():
            doc = self._load_doc()
            views = dict(doc.get("views") or {})
            if name in views:
                del views[name]
                doc["views"] = views
                self._publish_doc(doc)

    # -- materialized views -----------------------------------------------------
    # A materialized view (ingest/mview.py) stores its agg-view SPEC in
    # the catalog document and its STATE under <warehouse>/_mviews/; the
    # same atomic publish and mutation lock cover it. Name space is
    # shared with tables and views — one name, one thing.

    def mview_names(self) -> list:
        return sorted(self._load_doc().get("mviews") or {})

    def mview_spec(self, name: str) -> dict:
        mvs = self._load_doc().get("mviews") or {}
        if name not in mvs:
            raise ValueError(
                f"unknown materialized view {name!r} in warehouse "
                f"{self.warehouse}; known: {sorted(mvs)}"
            )
        return mvs[name]

    def register_mview(self, name: str, spec: dict) -> None:
        if not _NAME_RE.match(name):
            raise ValueError(f"invalid materialized view name: {name!r}")
        with self._locked():
            doc = self._load_doc()
            if name in (doc.get("tables") or {}):
                raise ValueError(
                    f"{name!r} is already a TABLE in this warehouse"
                )
            if name in (doc.get("views") or {}):
                raise ValueError(
                    f"{name!r} is already a VIEW in this warehouse"
                )
            mvs = dict(doc.get("mviews") or {})
            mvs[name] = spec
            doc["mviews"] = mvs
            self._publish_doc(doc)

    def unregister_mview(self, name: str) -> None:
        with self._locked():
            doc = self._load_doc()
            mvs = dict(doc.get("mviews") or {})
            if name in mvs:
                del mvs[name]
                doc["mviews"] = mvs
                self._publish_doc(doc)

    def mviews_referencing(self, table_name: str) -> list:
        """Materialized views whose BASE is ``table_name`` — exact
        match on the stored spec (unlike the durable-view word-match,
        the dependency is structural, not textual)."""
        return sorted(
            n
            for n, s in (self._load_doc().get("mviews") or {}).items()
            if s.get("table") == table_name
        )

    def views_referencing(self, table_name: str) -> list:
        """Durable views whose stored SQL mentions ``table_name`` as a
        word — the DROP TABLE dependency check. Conservative (a column
        spelled like the table matches too): the cost of a false hit is
        an explicit CASCADE, never a silently dangling view."""
        pat = re.compile(rf"\b{re.escape(table_name)}\b")
        return sorted(
            n
            for n, sql in (self._load_doc().get("views") or {}).items()
            if pat.search(sql)
        )


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
