"""Unit tests for the conservative statement-predicate extractor.

Every case here guards the substitution contract: a conjunct the
extractor returns must be provably AND-ed at the top level of a
single-relation statement's WHERE clause — when in doubt, return
nothing (the statement's own WHERE always re-applies in full, so a
missed conjunct costs only pruning opportunity, never correctness).
"""

from iceberg_file_writer_spark.ingest.predicate_extract import (
    safe_conjuncts,
    single_table_target,
)


def _target(sql):
    return single_table_target(sql)


class TestSingleTableTarget:
    def test_bare_select(self):
        assert _target("SELECT a FROM t") == ("t", None, None)

    def test_where_extracted(self):
        t, a, w = _target("SELECT a FROM t WHERE a = 5")
        assert (t, a) == ("t", None)
        assert w.strip() == "a = 5"

    def test_alias_forms(self):
        assert _target("SELECT x.a FROM t x WHERE x.a = 1")[:2] == ("t", "x")
        assert _target("SELECT x.a FROM t AS x")[:2] == ("t", "x")

    def test_where_not_taken_as_alias(self):
        t, a, w = _target("SELECT a FROM t WHERE a=1")
        assert a is None and w is not None

    def test_join_disqualifies(self):
        assert _target("SELECT * FROM t JOIN u ON t.k = u.k") is None

    def test_comma_cross_join_disqualifies(self):
        assert _target("SELECT * FROM t, u WHERE t.k = u.k") is None

    def test_subquery_disqualifies(self):
        assert (
            _target("SELECT * FROM t WHERE a IN (SELECT b FROM u)") is None
        )

    def test_union_disqualifies(self):
        assert _target("SELECT a FROM t UNION ALL SELECT a FROM t") is None

    def test_where_stops_at_group_by(self):
        _t, _a, w = _target(
            "SELECT a, count(*) FROM t WHERE a > 3 GROUP BY a"
        )
        assert w.strip() == "a > 3"

    def test_where_stops_at_order_limit(self):
        _t, _a, w = _target("SELECT a FROM t WHERE a > 3 ORDER BY a LIMIT 5")
        assert w.strip() == "a > 3"

    def test_from_inside_string_is_data(self):
        got = _target("SELECT 'no FROM here' AS s, a FROM t")
        assert got == ("t", None, None)

    def test_comma_inside_quoted_head_ok(self):
        # the comma lives in a string literal, not the FROM list
        t, _a, w = _target("SELECT concat(a, 'x,y') AS s FROM t WHERE a=1")
        assert t == "t" and w is not None


class TestSafeConjuncts:
    def test_equality_and_range(self):
        got = safe_conjuncts("a = 5 AND b >= 2 AND c < 'x'", {"t"})
        assert got == [("a", "=", 5), ("b", ">=", 2), ("c", "<", "x")]

    def test_or_disables_everything(self):
        assert safe_conjuncts("a = 5 OR b = 2", {"t"}) == []
        assert safe_conjuncts("a = 5 AND (b = 2 OR c = 3)", {"t"}) == []

    def test_not_disables_everything(self):
        assert safe_conjuncts("NOT a = 5 AND b = 2", {"t"}) == []

    def test_is_not_null_allowed(self):
        got = safe_conjuncts("a IS NOT NULL AND b IS NULL", {"t"})
        assert got == [("a", "notnull"), ("b", "isnull")]

    def test_in_list(self):
        got = safe_conjuncts("a IN (1, 2, 3)", {"t"})
        assert got == [("a", "in", [1, 2, 3])]

    def test_in_strings(self):
        got = safe_conjuncts("a IN ('x', 'O''Brien')", {"t"})
        assert got == [("a", "in", ["x", "O'Brien"])]

    def test_qualified_by_table_or_alias(self):
        got = safe_conjuncts("t.a = 5 AND x.b = 2", {"t", "x"})
        assert got == [("a", "=", 5), ("b", "=", 2)]

    def test_foreign_qualifier_skipped(self):
        assert safe_conjuncts("u.a = 5", {"t"}) == []

    def test_unsupported_shapes_ignored_not_fatal(self):
        got = safe_conjuncts(
            "a = 5 AND b BETWEEN 1 AND 9 AND f(c) = 2 AND d = e", {"t"}
        )
        # the BETWEEN halves, function call, and col=col fragments all
        # fail the matchers; the provable conjunct survives
        assert ("a", "=", 5) in got
        assert all(c[0] == "a" for c in got)

    def test_or_inside_string_literal_is_data(self):
        got = safe_conjuncts("a = 'x OR y' AND b = 2", {"t"})
        assert got == [("a", "=", "x OR y"), ("b", "=", 2)]

    def test_and_inside_string_literal_not_a_split(self):
        got = safe_conjuncts("a = 'p AND q'", {"t"})
        assert got == [("a", "=", "p AND q")]

    def test_neq_forms(self):
        got = safe_conjuncts("a != 1 AND b <> 2", {"t"})
        assert got == [("a", "!=", 1), ("b", "!=", 2)]

    def test_float_and_negative_literals(self):
        got = safe_conjuncts("a = -3 AND b < 2.5", {"t"})
        assert got == [("a", "=", -3), ("b", "<", 2.5)]

    def test_null_literal_comparison_ignored(self):
        assert safe_conjuncts("a = NULL", {"t"}) == []


class TestLexicalHazards:
    """Findings from the round-13 self-review: Spark lexical forms the
    extractor's lexer does not model must DISABLE extraction, never
    feed it."""

    def test_line_comment_disables_extraction(self):
        # '-- note AND j = 2' is comment text to Spark; extracting
        # j = 2 would filter rows the query never filtered
        sql = "SELECT * FROM t WHERE k = 1 -- note AND j = 2"
        assert single_table_target(sql) is None
        assert safe_conjuncts("k = 1 -- AND j = 2", {"t"}) == []

    def test_bracket_comment_disables_extraction(self):
        sql = "SELECT * FROM t WHERE k = 1 /* AND j = 2 */"
        assert single_table_target(sql) is None

    def test_double_quoted_literal_is_masked(self):
        # Spark treats "..." as a string literal; its content must
        # never parse as syntax
        got = safe_conjuncts('s = "x AND k = 5 AND y"', {"t"})
        assert all(c[0] != "k" for c in got)
        t = single_table_target(
            'SELECT * FROM t WHERE s = "x AND k = 5"'
        )
        assert t is not None  # statement shape is fine, content hidden

    def test_backslash_escape_literal_refused(self):
        # Spark reads 'a\nb' as a-newline-b; the extractor must not
        # prune on the raw backslash form
        got = safe_conjuncts(r"s = 'a\nb' AND k = 2", {"t"})
        assert got == [("k", "=", 2)]

    def test_escaped_quote_inside_literal(self):
        got = safe_conjuncts(r"s = 'a\'b OR 1' AND k = 2", {"t"})
        assert ("k", "=", 2) in got
        assert all(c[0] != "1" for c in got)


class TestTypedConjuncts:
    def test_type_gate_rules(self):
        from iceberg_file_writer_spark.ingest.predicate_extract import (
            typed_conjuncts,
        )

        pairs = [("I", "bigint"), ("D", "double"), ("S", "string"),
                 ("TS", "timestamp")]
        got = typed_conjuncts(
            [
                ("i", "=", 5),          # int on integral: keep, exact case
                ("d", "=", 5),          # int on double: promote to float
                ("s", "=", "x"),        # str on string: keep
                ("ts", "=", "2024-01-05"),  # str on timestamp: DROP
                ("i", "=", "5"),        # str on integral: DROP
                ("s", "=", 5),          # int on string: DROP
                ("ts", "isnull"),       # null test: type-independent
                ("d", "in", [1, 2]),    # promote member-wise
                ("i", "in", [1, "2"]),  # one bad member drops the IN
                ("nope", "=", 1),       # unknown column: DROP
            ],
            pairs,
        )
        assert got == [
            ("I", "=", 5),
            ("D", "=", 5.0),
            ("S", "=", "x"),
            ("TS", "isnull"),
            ("D", "in", [1.0, 2.0]),
        ]
