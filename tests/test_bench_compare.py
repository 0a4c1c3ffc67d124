"""tools/bench_compare.py — the mechanical form of the median-ratio
discipline (VERDICT r13 'What's wrong' #2): single-run or untrusted
artifacts must be REFUSED for cross-artifact adjudication, multi-run
trusted artifacts compare by median per-query ratio, and longdoc rows
only compare within one fixture."""

from __future__ import annotations

import importlib.util
import json


def _load():
    spec = importlib.util.spec_from_file_location(
        "bench_compare", "/root/repo/tools/bench_compare.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _art(**over):
    art = {
        "metric": "headline_queries_total",
        "value": 10.0,
        "unit": "sec",
        "queries": {"q1": 1.0, "q2": 2.0, "q3": 4.0, "longdoc_q1": 3.0},
        "sf": 0.1,
        "trusted": True,
        "n_runs": 3,
        "run_totals": [10.1, 10.0, 9.9],
        "longdoc_fixture": "aaaa00000000",
    }
    art.update(over)
    return art


def test_refuses_single_run():
    bc = _load()
    rc, lines = bc.adjudicate(_art(n_runs=1), _art())
    assert rc == 2
    assert any("n_runs=1" in ln for ln in lines)
    # pre-r14 artifact: no n_runs field at all
    old = _art()
    del old["n_runs"]
    rc, lines = bc.adjudicate(_art(), old)
    assert rc == 2
    assert any("n_runs=None" in ln for ln in lines)


def test_refuses_untrusted():
    bc = _load()
    rc, lines = bc.adjudicate(_art(trusted=False), _art())
    assert rc == 2
    assert any("trusted=False" in ln for ln in lines)


def test_refuses_unparsed_payload(tmp_path):
    bc = _load()
    p = tmp_path / "wrapped.json"
    p.write_text(json.dumps({"parsed": None, "tail": "..."}))
    assert bc.load_artifact(str(p)) is None
    rc, lines = bc.adjudicate(None, _art())
    assert rc == 2


def test_median_ratio_and_movers():
    bc = _load()
    cand = _art(
        queries={"q1": 2.0, "q2": 2.0, "q3": 4.0, "longdoc_q1": 3.0}
    )
    rc, lines = bc.adjudicate(_art(), cand)
    assert rc == 0
    # ratios: q1 2.0, q2 1.0, q3 1.0, longdoc_q1 1.0 -> median 1.0
    assert any("median ratio candidate/baseline = 1.00" in ln for ln in lines)
    assert any("q1 2.00x" in ln for ln in lines)


def test_longdoc_rows_skip_on_fixture_mismatch():
    bc = _load()
    cand = _art(
        longdoc_fixture="bbbb11111111",
        queries={"q1": 1.0, "q2": 2.0, "q3": 4.0, "longdoc_q1": 300.0},
    )
    rc, lines = bc.adjudicate(_art(), cand)
    assert rc == 0
    assert any("longdoc rows skipped" in ln for ln in lines)
    # the wild longdoc row must not have entered the ratio table
    assert any("3 common rows" in ln for ln in lines)


def test_load_artifact_accepts_both_shapes(tmp_path):
    bc = _load()
    raw = tmp_path / "raw.json"
    raw.write_text(json.dumps(_art()))
    wrapped = tmp_path / "wrapped.json"
    wrapped.write_text(json.dumps({"n": 14, "parsed": _art()}))
    assert bc.load_artifact(str(raw))["n_runs"] == 3
    assert bc.load_artifact(str(wrapped))["n_runs"] == 3


def test_load_artifact_accepts_snapshot_txt(tmp_path):
    """Captured-output snapshots (.txt) carry prefixed runs_detail /
    longdoc_detail lines before the contract JSON line — the LAST
    parseable JSON line is the artifact."""
    bc = _load()
    snap = tmp_path / "snap.txt"
    snap.write_text(
        'runs_detail: {"q1":[1.0,1.1,0.9]}\n'
        'longdoc_detail: {"longdoc_q1":3.0}\n'
        + json.dumps(_art()) + "\n"
    )
    art = bc.load_artifact(str(snap))
    assert art is not None and art["n_runs"] == 3
    # garbage file -> None, not a traceback
    bad = tmp_path / "bad.txt"
    bad.write_text("no json here\n")
    assert bc.load_artifact(str(bad)) is None


def test_load_artifact_ignores_trailing_nonartifact_json(tmp_path):
    """ADVICE r14: the .txt fallback took the LAST line starting with
    '{' — a capture that appends any trailing JSON-ish diagnostic line
    after the artifact line would silently adjudicate from the wrong
    payload. The loop must take the last line that parses AND carries
    the 'queries' contract."""
    bc = _load()
    snap = tmp_path / "snap.txt"
    snap.write_text(
        json.dumps(_art()) + "\n"
        + '{"note": "post-run diagnostic", "steal_share": 0.01}\n'
    )
    art = bc.load_artifact(str(snap))
    assert art is not None and "queries" in art and art["n_runs"] == 3
