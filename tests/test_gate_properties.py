"""Property-based tests for the read-only SQL gate and parameter binder
(hypothesis): the gate must never pass a mutating statement, and binding
must never let parameter VALUES inject SQL structure."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from economic_data_project_spark.sources.warehouse import (
    QueryValidationError,
    bind_params,
    validate_read_only,
)

_MUTATORS = [
    "INSERT INTO t VALUES (1)",
    "UPDATE t SET x = 1",
    "DELETE FROM t",
    "DROP TABLE t",
    "CREATE TABLE t (x INT)",
    "ALTER TABLE t ADD COLUMN y INT",
    "TRUNCATE TABLE t",
    "MERGE INTO t USING s ON t.id = s.id WHEN MATCHED THEN DELETE",
]


@given(
    prefix=st.sampled_from(["", "  ", "-- c\n", "/* c */ "]),
    stmt=st.sampled_from(_MUTATORS),
)
def test_gate_rejects_mutations_any_prefix(prefix, stmt):
    try:
        validate_read_only(prefix + stmt)
        raised = False
    except QueryValidationError:
        raised = True
    assert raised


@given(
    stmt=st.sampled_from(_MUTATORS),
    sep=st.sampled_from(["; ", " ;", ";\n"]),
)
def test_gate_rejects_piggybacked_statement(stmt, sep):
    try:
        validate_read_only("SELECT 1" + sep + stmt)
        raised = False
    except QueryValidationError:
        raised = True
    assert raised


@settings(max_examples=200)
@given(
    value=st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), max_codepoint=0x2FF
        ),
        max_size=40,
    )
)
def test_bound_strings_cannot_escape_literal(value):
    """However adversarial the string value, the bound SQL must still
    validate as a single read-only SELECT — the value can't terminate the
    literal and smuggle in a second statement."""
    bound = bind_params("SELECT * FROM t WHERE v = @v", {"v": value})
    validate_read_only(bound)  # must not raise


@given(n=st.integers(-(2**62), 2**62), f=st.floats(allow_nan=False, allow_infinity=False))
def test_numeric_binding_roundtrip_shapes(n, f):
    bound = bind_params("SELECT @a AS a, @b AS b", {"a": n, "b": f})
    assert str(n) in bound
    validate_read_only(bound)


# ----------------------------------------------------------- lexer parity
# Regression cases for the single-scan lexer (ADVICE r1): a two-pass
# comment-then-string strip desyncs from Spark's lexer on `--` inside
# string literals and on backslash escapes.


def test_gate_rejects_piggyback_after_string_with_comment_marker():
    # '--' inside the literal must NOT comment out the rest of the line.
    try:
        validate_read_only("SELECT 'x--'; DROP TABLE t")
        raised = False
    except QueryValidationError:
        raised = True
    assert raised


def test_gate_accepts_comment_marker_inside_string():
    validate_read_only("SELECT 'a--b' AS c")  # must not raise
    validate_read_only('SELECT "a--b" AS c')


def test_gate_handles_backslash_escaped_quote():
    # Spark lexes 'a\' OR 1; DROP...' as ONE string literal; the gate
    # must agree (no false multi-statement, no false DROP hit).
    validate_read_only("SELECT 'a\\' OR 1; DROP TABLE t' AS s")


def test_gate_rejects_statement_after_backslash_escaped_string():
    try:
        validate_read_only("SELECT 'a\\'b'; DROP TABLE t")
        raised = False
    except QueryValidationError:
        raised = True
    assert raised


def test_gate_adjacent_quote_pairs_match_spark_lexing():
    # '' is two adjacent literals in Spark, not an escape; either way the
    # statement is a single read-only SELECT.
    validate_read_only("SELECT 'it''s fine' AS s")


def test_gate_ignores_keywords_in_backtick_identifiers():
    validate_read_only("SELECT `drop` FROM t")


def test_gate_rejects_nested_block_comment_smuggling():
    try:
        validate_read_only("SELECT 1 /* /* nested */ still */ ; DROP TABLE t")
        raised = False
    except QueryValidationError:
        raised = True
    assert raised


def test_binder_skips_params_inside_strings_lexer_aware():
    bound = bind_params("SELECT '@notparam' AS s, @p AS p", {"p": 7})
    assert "@notparam" in bound and " 7 AS p" in bound.replace("  ", " ")


def test_binder_rejects_nonfinite_floats_as_bare_literals():
    bound = bind_params("SELECT @x AS x", {"x": float("nan")})
    assert "CAST('NaN' AS DOUBLE)" in bound
    bound = bind_params("SELECT @x AS x", {"x": float("-inf")})
    assert "CAST('-Infinity' AS DOUBLE)" in bound
