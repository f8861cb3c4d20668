"""Conservative predicate extraction for statement-level pruned scans
[extension — not in reference].

``execute_query`` resolves a bare snapshot-table reference to a full
CURRENT-version read; for a single-table SELECT with a WHERE clause
that is wasteful — the manifest's zone maps and bloom sidecars
(ingest/file_skipping.py, ingest/bloom_index.py) can usually prove
most files irrelevant before any data IO. This module extracts the
prunable part of a statement SO CONSERVATIVELY that substituting a
pruned scan for the full read can never change results:

- only single-relation statements qualify (exactly one ``FROM``, no
  JOIN/UNION/INTERSECT/EXCEPT/LATERAL, no comma cross-join) — a
  predicate over a joined relation must never prune another table's
  files;
- the WHERE clause must be a pure conjunction: any ``OR`` or ``NOT``
  (other than ``IS NOT NULL``) anywhere disables extraction entirely,
  because a disjunct braids conjuncts across branches;
- within the conjunction, only shapes the pruners understand are
  taken (``col <op> literal``, ``col IN (literals)``, ``col IS
  [NOT] NULL``); everything else is simply not used for pruning — it
  stays in the statement's own WHERE, which always re-applies in full.

The extraction is an OPTIMIZATION CONTRACT, not a parser: a returned
conjunct is guaranteed to be AND-ed at the top level of the WHERE
clause, so any file the pruners exclude on it provably holds no
matching row. String literals are masked before any keyword scan, so
quoted data can never masquerade as syntax.

Reference scope note: the reference (/root/reference/main.go:47-54)
writes files and never reads them back; this is query-layer planning
above its output. [extension]
"""

from __future__ import annotations

import re

_ID = r"[A-Za-z_][A-Za-z0-9_]*"
# keywords that terminate the WHERE clause
_CLAUSE_END = re.compile(
    r"\b(GROUP|ORDER|LIMIT|HAVING|WINDOW|DISTRIBUTE|CLUSTER|SORT)\b",
    re.IGNORECASE,
)
# relation combinators that disqualify the statement outright
_MULTI_REL = re.compile(
    r"\b(JOIN|UNION|INTERSECT|EXCEPT|LATERAL)\b", re.IGNORECASE
)
# words that must not be mistaken for a table alias
_NOT_ALIAS = frozenset(
    """where group order limit having window union join on inner left
    right full cross lateral distribute cluster sort version timestamp
    for as intersect except""".split()
)

_NUM_RE = re.compile(r"^-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?$")


def _mask_strings(text: str) -> str:
    """Replace every character inside string literals by a space,
    preserving length — keyword/offset scans on the mask can never be
    fooled by quoted data. Spark's THREE lexical forms are handled:
    single-quoted (with '' and backslash escapes), double-quoted (also
    a string literal in Spark, same escapes), and backslash-escaped
    characters inside either (the char after a backslash is data even
    when it is the quote itself)."""
    out, i, n = list(text), 0, len(text)
    quote = None  # the delimiter of the literal we are inside, or None
    while i < n:
        ch = text[i]
        if quote is not None:
            if ch == "\\" and i + 1 < n:
                out[i] = out[i + 1] = " "
                i += 2
                continue
            if ch == quote:
                if i + 1 < n and text[i + 1] == quote:
                    out[i] = out[i + 1] = " "
                    i += 2
                    continue
                quote = None
            else:
                out[i] = " "
        elif ch in ("'", '"'):
            quote = ch
        i += 1
    return "".join(out)


def _has_comment(masked: str) -> bool:
    """True when the masked text contains a SQL comment opener (``--``
    or ``/*``) outside any string literal. The extractor's lexer does
    not model comments, so their presence disables extraction entirely
    — commented-out text must never become a live filter."""
    return "--" in masked or "/*" in masked


def single_table_target(stmt: str):
    """``(table, alias_or_None, where_text_or_None)`` when ``stmt`` is
    a single-relation SELECT safe for scan substitution, else None."""
    masked = _mask_strings(stmt)
    if _has_comment(masked):
        return None
    froms = list(re.finditer(r"\bFROM\b", masked, re.IGNORECASE))
    if len(froms) != 1 or _MULTI_REL.search(masked):
        return None
    m = re.match(
        rf"\s+(?P<t>{_ID})(?:\s+(?:AS\s+)?(?P<a>{_ID}))?",
        masked[froms[0].end():],
    )
    if not m:
        return None
    alias = m.group("a")
    if alias and alias.lower() in _NOT_ALIAS:
        alias = None
        end = froms[0].end() + m.end("t")
    else:
        end = froms[0].end() + m.end()
    # a comma after the relation (before any clause keyword) is a
    # cross join — disqualify
    rest = masked[end:]
    stop = _CLAUSE_END.search(rest)
    wm = re.search(r"\bWHERE\b", rest, re.IGNORECASE)
    head_end = min(
        p for p in (len(rest), stop.start() if stop else len(rest),
                    wm.start() if wm else len(rest))
    )
    if "," in rest[:head_end]:
        return None
    if not wm or (stop and stop.start() < wm.start()):
        return (m.group("t"), alias, None)
    after = rest[wm.end():]
    stop2 = _CLAUSE_END.search(after)
    w_masked = after[: stop2.start()] if stop2 else after
    # map the masked span back to the original text
    base = end + wm.end()
    where_text = stmt[base: base + len(w_masked)]
    return (m.group("t"), alias, where_text)


def _parse_literal(tok: str):
    """Python value for a SQL literal token, or (None, False) when the
    token is not a supported literal. Returns (value, ok)."""
    tok = tok.strip()
    if _NUM_RE.match(tok):
        if re.match(r"^-?\d+$", tok):
            return int(tok), True
        return float(tok), True
    if len(tok) >= 2 and tok.startswith("'") and tok.endswith("'"):
        body = tok[1:-1]
        if "\\" in body:
            # Spark interprets backslashes as escapes ('a\nb' is a
            # real newline); this lexer does not — refuse rather than
            # prune on a value Spark never compares against
            return None, False
        return body.replace("''", "'"), True
    return None, False


_LIT = r"(?:-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|'(?:[^']|'')*')"
_CMP_RE = re.compile(
    rf"^(?:(?P<p>{_ID})\s*\.\s*)?(?P<c>{_ID})\s*"
    rf"(?P<op><=|>=|!=|<>|<|>|=)\s*(?P<v>{_LIT})$"
)
_IN_RE = re.compile(
    rf"^(?:(?P<p>{_ID})\s*\.\s*)?(?P<c>{_ID})\s+IN\s*"
    rf"\(\s*(?P<vs>{_LIT}(?:\s*,\s*{_LIT})*)\s*\)$",
    re.IGNORECASE,
)
_NULL_RE = re.compile(
    rf"^(?:(?P<p>{_ID})\s*\.\s*)?(?P<c>{_ID})\s+IS\s+"
    rf"(?P<not>NOT\s+)?NULL$",
    re.IGNORECASE,
)


_INTEGRAL = frozenset({"tinyint", "smallint", "int", "bigint", "long"})
_FLOATING = frozenset({"float", "double"})


def typed_conjuncts(conjuncts: list, schema_pairs: list) -> list:
    """Second gate: keep only conjuncts whose LITERAL TYPE matches the
    column's declared type under the pruners' comparison contracts —
    and rewrite column names to their exact-case schema spelling (stats
    and sidecar keys are exact-case; Spark's resolution is not).

    Why this exists: the stats index compares numerics numerically but
    strings lexicographically against CAST-style renderings (timestamps
    as fixed-width strings), and the bloom sidecar matches the exact
    ``CAST(col AS STRING)`` rendering. A literal of the wrong type can
    therefore FALSE-NEGATIVE — ``double_col = 5`` probes '5' against a
    stored '5.0', ``ts_col = '2024-01-05'`` probes a truncated string
    against '2024-01-05 00:00:00.000000' — and a false negative here is
    silently lost rows, the one failure mode the whole extraction is
    built to exclude. Rules, all conservative:

    - integral column: int literal passes; anything else drops.
    - floating column: int/float literals pass, the int PROMOTED to
      float so the bloom probe skips it (``_probe_safe`` rejects
      floats) while stats still compare numerically.
    - string column: str literal passes (CAST is identity).
    - every other column type (timestamp, date, decimal, complex) and
      any unknown column: drop — Spark may cast-compare forms the
      pruners' renderings cannot reproduce.
    - IN lists convert member-wise; ONE unconvertible member drops the
      whole conjunct (a partial candidate list could exclude a file
      holding the dropped member's rows).
    - IS [NOT] NULL is type-independent: passes on any known column.
    """
    by_lower = {name.lower(): (name, typ) for name, typ in schema_pairs}

    def _convert(typ: str, v):
        base = typ.strip().lower()
        if base in _INTEGRAL:
            return (v, True) if isinstance(v, int) and not isinstance(v, bool) else (None, False)
        if base in _FLOATING:
            if isinstance(v, bool):
                return None, False
            if isinstance(v, (int, float)):
                return float(v), True
            return None, False
        if base == "string":
            return (v, True) if isinstance(v, str) else (None, False)
        return None, False

    out = []
    for col, op, *rest in conjuncts:
        hit = by_lower.get(col.lower())
        if hit is None:
            continue
        name, typ = hit
        if op in ("isnull", "notnull"):
            out.append((name, op))
            continue
        if op == "in":
            vals, ok = [], True
            for v in rest[0]:
                cv, vok = _convert(typ, v)
                ok = ok and vok
                vals.append(cv)
            if ok and vals:
                out.append((name, "in", vals))
            continue
        cv, ok = _convert(typ, rest[0])
        if ok:
            out.append((name, op, cv))
    return out


def safe_conjuncts(where_text: str, qualifiers: set) -> list:
    """Extract ``[(col, op, value), ...]`` pruner conjuncts from a
    WHERE clause. ``qualifiers`` are the prefixes (table name, alias)
    allowed to qualify a column; any other qualifier disables that
    conjunct. Empty list = nothing provable — never an error."""
    masked = _mask_strings(where_text)
    if _has_comment(masked):
        return []
    # allow IS NOT NULL, refuse every other NOT / any OR
    neutral = re.sub(r"\bIS\s+NOT\s+NULL\b", " ", masked, flags=re.IGNORECASE)
    if re.search(r"\bOR\b|\bNOT\b", neutral, re.IGNORECASE):
        return []
    out = []
    pos = 0
    bounds = [m.span() for m in re.finditer(r"\bAND\b", masked, re.IGNORECASE)]
    pieces = []
    for a, b in bounds:
        pieces.append(where_text[pos:a])
        pos = b
    pieces.append(where_text[pos:])
    quals = {q.lower() for q in qualifiers}
    for piece in pieces:
        frag = piece.strip()
        m = _CMP_RE.match(frag)
        if m:
            if m.group("p") and m.group("p").lower() not in quals:
                continue
            v, ok = _parse_literal(m.group("v"))
            if not ok:
                continue
            op = m.group("op")
            out.append((m.group("c"), "!=" if op == "<>" else op, v))
            continue
        m = _IN_RE.match(frag)
        if m:
            if m.group("p") and m.group("p").lower() not in quals:
                continue
            vals, all_ok = [], True
            for tok in re.findall(_LIT, m.group("vs")):
                v, ok = _parse_literal(tok)
                all_ok = all_ok and ok
                vals.append(v)
            if all_ok and vals:
                out.append((m.group("c"), "in", vals))
            continue
        m = _NULL_RE.match(frag)
        if m:
            if m.group("p") and m.group("p").lower() not in quals:
                continue
            out.append(
                (m.group("c"), "notnull" if m.group("not") else "isnull")
            )
    return out
