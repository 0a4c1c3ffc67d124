"""Cross-artifact bench adjudication gate (VERDICT r13 'What's wrong'
#2): compare two bench artifacts by MEDIAN per-query ratio, refusing
inputs the measured host variance makes uncomparable.

Usage: python tools/bench_compare.py BASELINE.json CANDIDATE.json

Three same-gate trusted single runs measured 89.5s / 127.0s / 82.3s on
engine-identical code (tools/bench_snapshots/r13_variance_note.md) —
up to ~1.4x per-row host variance with external share ~0 and steal ~0.
The median-ratio discipline previously lived in a note and a verify
habit; this tool makes it mechanical. It REFUSES (exit 2) when either
artifact:

- has no parseable payload (a driver wrapper whose `parsed` is null),
- is not stamped ``trusted: true`` (contention evidence, not a
  measurement),
- is a single run: ``n_runs`` missing (every pre-r14 artifact) or < 2
  — bench.py emits per-query medians over 3 gated repetitions since
  r14, and one run cannot be told apart from the measured 1.4x box
  noise.

Longdoc rows additionally compare only between artifacts with the same
``longdoc_fixture`` (VERDICT r11 #5); on mismatch they are skipped with
a note rather than failing the whole adjudication.
"""

from __future__ import annotations

import json
import statistics
import sys

MIN_RUNS = 2


def load_artifact(path: str) -> dict | None:
    """Load a bench artifact: bench.py's raw JSON line (snapshot .json
    files), the driver's BENCH_r{N}.json wrapper (payload under
    `parsed`), or a captured-output snapshot (.txt with prefixed
    runs_detail/longdoc_detail lines — the LAST parseable JSON line is
    the contract). Returns None when there is no parseable payload."""
    with open(path) as fh:
        text = fh.read()
    def _unwrap(d):
        return d["parsed"] if isinstance(d, dict) and "parsed" in d else d

    def _is_artifact(d):
        return isinstance(d, dict) and "queries" in d

    try:
        doc = _unwrap(json.loads(text))
    except ValueError:
        # the artifact-line contract lives in the LOOP (ADVICE r14: a
        # snapshot whose capture appends any trailing JSON-ish
        # diagnostic line would otherwise silently adjudicate from the
        # wrong payload) — take the last line that both parses AND is
        # an artifact, not merely the last that parses.
        doc = None
        for line in reversed(text.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    cand = _unwrap(json.loads(line))
                except ValueError:
                    continue
                if _is_artifact(cand):
                    doc = cand
                    break
    if not _is_artifact(doc):
        return None
    return doc


def _refusals(label: str, art: dict | None) -> list[str]:
    if art is None:
        return [f"{label}: no parseable payload (driver tail truncated?)"]
    out = []
    if art.get("trusted") is not True:
        out.append(
            f"{label}: trusted={art.get('trusted')} — contention"
            " evidence, not a measurement"
        )
    n = art.get("n_runs")
    if n is None or n < MIN_RUNS:
        out.append(
            f"{label}: n_runs={n} — single-run artifacts carry up to"
            " ~1.4x host variance (r13_variance_note.md); rerun"
            " bench.py (median-of-3 since r14)"
        )
    return out


def adjudicate(base: dict | None, cand: dict | None) -> tuple[int, list[str]]:
    """(exit_code, report_lines). exit 2 = refused, 0 = adjudicated."""
    refusals = _refusals("baseline", base) + _refusals("candidate", cand)
    if refusals:
        return 2, ["REFUSED: cross-artifact adjudication gate"] + [
            "  - " + r for r in refusals
        ]
    lines = []
    bq, cq = dict(base["queries"]), dict(cand["queries"])
    if base.get("longdoc_fixture") != cand.get("longdoc_fixture"):
        lines.append(
            "note: longdoc_fixture differs"
            f" ({base.get('longdoc_fixture')} vs"
            f" {cand.get('longdoc_fixture')}) — longdoc rows skipped"
        )
        bq = {n: t for n, t in bq.items() if not n.startswith("longdoc_")}
        cq = {n: t for n, t in cq.items() if not n.startswith("longdoc_")}
    ratios = {
        name: cq[name] / bq[name]
        for name in sorted(set(bq) & set(cq))
        if bq[name] > 0
    }
    if not ratios:
        return 2, lines + ["REFUSED: no common timed rows"]
    med = statistics.median(ratios.values())
    lines.append(
        f"{len(ratios)} common rows; median ratio"
        f" candidate/baseline = {med:.2f}"
        f" (n_runs {base['n_runs']} vs {cand['n_runs']})"
    )
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:5]
    best = sorted(ratios.items(), key=lambda kv: kv[1])[:5]
    lines.append("slowest movers: " + ", ".join(
        f"{n} {r:.2f}x" for n, r in worst
    ))
    lines.append("fastest movers: " + ", ".join(
        f"{n} {r:.2f}x" for n, r in best
    ))
    return 0, lines


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__)
        return 2
    rc, lines = adjudicate(load_artifact(argv[1]), load_artifact(argv[2]))
    print("\n".join(lines))
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv))
