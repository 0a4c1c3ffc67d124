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


def test_priority_order_fresh_then_oldest_stale(monkeypatch):
    se = _load_entry()
    monkeypatch.setattr(se, "_stale_queries", lambda: ["b", "c"])
    monkeypatch.setattr(
        se, "_last_pass_round", lambda: {"a": 2, "b": 3, "c": 1}
    )
    # d never passed -> fresh bucket first; stale ordered oldest green
    # first (c r1 before b r3); stable tail last
    assert se._priority_order(["a", "b", "c", "d"]) == [
        "d",
        "c",
        "b",
        "a",
    ]
