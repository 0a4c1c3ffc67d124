"""Driver re-verification priority machinery (__spark_entry__)."""

from __future__ import annotations

import importlib.util


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ast_changed_ignores_comment_and_whitespace(
    tmp_path, monkeypatch
):
    se = _load_entry()
    monkeypatch.setattr(se, "_HERE", str(tmp_path))
    (tmp_path / "m.py").write_text(
        "# a new comment\nx = 1\n\n\ndef f():\n    return x\n"
    )
    monkeypatch.setattr(
        se, "_git", lambda *a: "x = 1\ndef f():\n    return x\n"
    )
    assert se._ast_changed("m.py", "deadbeef") is False


def test_ast_changed_flags_code_edits(tmp_path, monkeypatch):
    se = _load_entry()
    monkeypatch.setattr(se, "_HERE", str(tmp_path))
    (tmp_path / "m.py").write_text("x = 2\n")
    monkeypatch.setattr(se, "_git", lambda *a: "x = 1\n")
    assert se._ast_changed("m.py", "deadbeef") is True


def test_ast_changed_fails_stale(tmp_path, monkeypatch):
    se = _load_entry()
    monkeypatch.setattr(se, "_HERE", str(tmp_path))
    # missing current file -> OSError -> stale (over-verify, never skip)
    monkeypatch.setattr(se, "_git", lambda *a: "x = 1\n")
    assert se._ast_changed("gone.py", "deadbeef") is True
    # unparseable old blob -> stale
    (tmp_path / "m.py").write_text("x = 1\n")
    monkeypatch.setattr(se, "_git", lambda *a: "def (broken\n")
    assert se._ast_changed("m.py", "deadbeef") is True


def test_priority_order_fresh_then_direct_stale_then_age(monkeypatch):
    se = _load_entry()

    def _stale(checked=None, direct_only=False):
        # b's DEFINING module changed; c is flagged only transitively
        return ["b"] if direct_only else ["b", "c"]

    monkeypatch.setattr(se, "_stale_queries", _stale)
    monkeypatch.setattr(
        se, "_last_checked_round", lambda *a: {"a": 2, "b": 3, "c": 1}
    )
    # d never passed -> fresh bucket first; then DIRECT-stale b jumps
    # the age queue (VERDICT r11 #1 — an edited builder must not ship
    # driver-unverified behind merely-older unchanged rows); then age:
    # c (r1, transitively stale) before a (r2, unchanged)
    assert se._priority_order(["a", "b", "c", "d"]) == [
        "d",
        "b",
        "c",
        "a",
    ]


def test_priority_order_direct_stale_ordered_by_age(monkeypatch):
    se = _load_entry()
    # both direct-stale -> age still ranks within the direct tier
    monkeypatch.setattr(se, "_stale_queries", lambda *a: ["a", "b"])
    monkeypatch.setattr(
        se, "_last_checked_round", lambda *a: {"a": 2, "b": 3}
    )
    assert se._priority_order(["a", "b"]) == ["a", "b"]


def test_priority_order_stale_first_within_round(monkeypatch):
    se = _load_entry()
    monkeypatch.setattr(se, "_stale_queries", lambda *a: ["b"])
    monkeypatch.setattr(
        se, "_last_checked_round", lambda *a: {"a": 3, "b": 3}
    )
    # same record age -> the changed query outranks the unchanged one
    assert se._priority_order(["a", "b"]) == ["b", "a"]


def test_rows_only_records_age_out_of_fresh(tmp_path, monkeypatch):
    """A rows-only query with a recorded driver run must NOT sit in the
    'fresh' bucket forever: it sorts with the stale queries by record
    age (VERDICT r5 'What's wrong' #1 — 7 permanently-fresh queries
    consumed prefix slots every round while 54 stale queries waited)."""
    import json

    se = _load_entry()
    monkeypatch.setattr(se, "_HERE", str(tmp_path))

    class _Reg:
        @staticmethod
        def all_queries():
            return {"green_q": None, "rows_only_q": None, "new_q": None}

        @staticmethod
        def all_oracles():
            return {"green_q": "SELECT 1", "new_q": "SELECT 1"}

    monkeypatch.setattr(se, "registry", _Reg)
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps(
            {
                "rows_only_q": {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": 37,
                    "oracle_rows": None,
                    "err": "no_oracle",
                }
            }
        )
    )
    (tmp_path / "CORRECTNESS_r04.json").write_text(
        json.dumps(
            {
                "green_q": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "spark_rows": 9,
                    "oracle_rows": 9,
                    "err": None,
                }
            }
        )
    )
    checked = se._last_checked_round()
    assert checked == {"green_q": 4, "rows_only_q": 3}
    names = ["green_q", "rows_only_q", "new_q"]
    # both recorded queries stale -> never-verified first, then the
    # rows-only record (r3) BEFORE the newer green row (r4)
    monkeypatch.setattr(
        se, "_stale_queries", lambda *a: ["green_q", "rows_only_q"]
    )
    assert se._priority_order(names) == ["new_q", "rows_only_q", "green_q"]
    # nothing stale -> recorded rows-only query still ages by its
    # driver-run round (r3 before r4), never back into the fresh bucket
    monkeypatch.setattr(se, "_stale_queries", lambda *a: [])
    assert se._priority_order(names) == ["new_q", "rows_only_q", "green_q"]


def test_rows_only_failed_record_stays_fresh(tmp_path, monkeypatch):
    """A rows-only query whose recorded run ERRORED (no row count, or a
    non-no_oracle error) has never been driver-checked — it must keep
    its fresh-bucket priority."""
    import json

    se = _load_entry()
    monkeypatch.setattr(se, "_HERE", str(tmp_path))

    class _Reg:
        @staticmethod
        def all_queries():
            return {"rows_only_q": None}

        @staticmethod
        def all_oracles():
            return {}

    monkeypatch.setattr(se, "registry", _Reg)
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps(
            {
                "rows_only_q": {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": None,
                    "oracle_rows": None,
                    "err": "exception: boom",
                }
            }
        )
    )
    assert se._last_checked_round() == {}
