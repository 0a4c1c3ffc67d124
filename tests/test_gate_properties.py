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
