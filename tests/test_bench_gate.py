"""bench.py trusted-run gate: the artifact may only stamp trusted=true
when BOTH the 1-min and 5-min load averages pass, and the wait loop
drains rather than spins (VERDICT r10 'What's wrong' #1 / brief #2 —
the r10 artifact was recorded at 1-min 1.13 and read as a phantom 24%
regression; an r11 probe at 1-min 0.71 / 5-min 5.24 was still
inflated, so the 5-min average is load-bearing too)."""

from __future__ import annotations

import importlib.util
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_wait_returns_immediately_when_quiet(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(
        bench.os, "getloadavg", lambda: (0.1, 0.2, 3.0)
    )
    monkeypatch.setattr(
        bench.time, "sleep", lambda s: (_ for _ in ()).throw(
            AssertionError("must not sleep when already quiet")
        ),
    )
    load = bench._wait_for_quiet(600)
    assert load[0] <= bench._QUIET_1MIN
    assert load[1] <= bench._QUIET_5MIN


def test_wait_drains_then_returns_quiet(monkeypatch):
    bench = _load_bench()
    seq = iter(
        [(0.5, 5.0, 4.0), (0.5, 3.0, 4.0), (0.4, 1.2, 3.0)]
    )
    cur = [(2.0, 6.0, 5.0)]

    def advance(_s):
        cur[0] = next(seq)

    monkeypatch.setattr(bench.os, "getloadavg", lambda: cur[0])
    monkeypatch.setattr(bench.time, "sleep", advance)
    load = bench._wait_for_quiet(600)
    assert load == (0.4, 1.2, 3.0)


def test_wait_gives_up_at_deadline_and_reports_loaded(monkeypatch):
    """A box that never drains must NOT hang the bench: the loop exits
    at the deadline and returns the still-loaded triple, which main()
    then stamps trusted=false (the machine-readable contract)."""
    bench = _load_bench()
    t = [0.0]

    def fake_monotonic():
        return t[0]

    def fake_sleep(s):
        t[0] += s

    monkeypatch.setattr(bench.time, "monotonic", fake_monotonic)
    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    monkeypatch.setattr(
        bench.os, "getloadavg", lambda: (7.0, 7.0, 7.0)
    )
    load = bench._wait_for_quiet(120)
    assert t[0] >= 120  # actually waited to the deadline, then stopped
    assert load[0] > bench._QUIET_1MIN  # -> trusted=false in main()


def test_five_min_average_alone_fails_the_gate(monkeypatch):
    """The r11 probe signature: 1-min quiet, 5-min hot. The gate must
    keep waiting (and, at deadline, report loaded) — a 1-min-only gate
    recorded that run as comparable when it was 1.2-1.6x inflated."""
    bench = _load_bench()
    monkeypatch.setattr(
        bench.os, "getloadavg", lambda: (0.71, 5.24, 4.65)
    )
    slept = [0]
    t = [0.0]
    monkeypatch.setattr(bench.time, "monotonic", lambda: t[0])

    def tick(s):
        slept[0] += 1
        t[0] += 30

    monkeypatch.setattr(bench.time, "sleep", tick)
    load = bench._wait_for_quiet(90)
    assert slept[0] >= 3  # it kept waiting on the 5-min average
    assert not (
        load[0] <= bench._QUIET_1MIN and load[1] <= bench._QUIET_5MIN
    )


def test_bench_importable_without_running(monkeypatch):
    """bench.py must stay import-safe (main guarded): the tests above
    and any tooling import it as a module."""
    mod = _load_bench()
    assert callable(mod.main)
    assert "bench" in sys.modules or True


def test_fixture_rev_tracks_corpus_content(spark, tmp_path):
    """`longdoc_fixture` (VERDICT r11 #5) must be a pure function of
    the corpus CONTENT: same parquet -> same hash (row order must not
    matter — the hash sorts per-doc digests), any doc edit -> a new
    hash, so best-ever longdoc comparisons can restrict themselves to
    same-fixture artifacts mechanically."""
    import os

    from pyspark.sql import functions as F

    bench = _load_bench()
    d1 = str(tmp_path / "a")
    d2 = str(tmp_path / "b")
    base = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )
    base.repartition(4).write.parquet(os.path.join(d1, "documents.parquet"))
    # same content, different row order/partitioning
    base.orderBy(F.col("doc_id").desc()).repartition(2).write.parquet(
        os.path.join(d2, "documents.parquet")
    )
    r1 = bench._fixture_rev(spark, d1)
    assert bench._fixture_rev(spark, d2) == r1
    # one edited doc -> different revision
    d3 = str(tmp_path / "c")
    base.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.lit("edited")).otherwise(
            F.col("text")
        ),
    ).write.parquet(os.path.join(d3, "documents.parquet"))
    assert bench._fixture_rev(spark, d3) != r1
    assert len(r1) == 12


def test_external_share_math_and_clamp():
    """External share = (system busy - our tree busy) / capacity, with
    hypervisor steal split into its own component; our own work never
    makes the box look contended (clamped at 0), and an unmeasurable
    probe propagates None (fail-open)."""
    bench = _load_bench()
    # 120 busy cpu-sec on the box (plus 16 stolen by the host), 100 of
    # the busy ours, 10s window on 32 cpus
    shares = bench._external_cpu_share(
        (1000, 50), 500, (1120, 66), 600, 10.0, 32
    )
    assert shares == ((120 - 100) / 320.0, 16 / 320.0)
    # bench-only box: ours >= busy delta (accounting jitter) -> 0
    assert bench._external_cpu_share(
        (0, 0), 0, (100, 0), 110, 10.0, 32
    ) == (0.0, 0.0)
    # any missing sample or a degenerate window -> None
    assert bench._external_cpu_share(None, 0, (1, 0), 1, 10.0, 32) is None
    assert bench._external_cpu_share((0, 0), 0, (1, 0), 1, 0.0, 32) is None


def test_end_contention_drops_trusted_stamp():
    """The artifact's trusted stamp must require BOTH a quiet start and
    a clean end probe; an unmeasurable end probe must NOT drop it
    (r12's driver artifact started quiet, loaded up mid-run, and still
    stamped trusted — the exact hole this closes)."""
    bench = _load_bench()
    for share, expect_contended in ((0.05, False), (0.35, True)):
        contended = share > bench._EXT_SHARE_MAX
        assert contended is expect_contended
        assert (True and not contended) is not expect_contended
    # None probe: fail-open
    assert (True and not None) is True


def test_cpu_probes_measure_this_box():
    """Live smoke: both probes read /proc successfully and our own
    process tree accounts for a subset of total system busy time."""
    bench = _load_bench()
    sysv = bench._system_busy_sec()
    ours = bench._proc_tree_cpu_sec()
    assert sysv is not None
    busy, steal = sysv
    assert busy > 0 and steal >= 0
    assert ours is not None and ours > 0
    assert ours <= busy


def test_orphan_attribution_rules():
    """ADVICE r13: a descendant reparented to init keeps its process
    group — an init-child in OUR pgrp (or running pyspark.daemon) is
    our orphan, not external contention."""
    import os

    bench = _load_bench()
    me = os.getpid()
    sid = os.getsid(0)
    # not an init child -> never claimed by the orphan rule
    assert not bench._is_orphaned_ours(12345, me, os.getpgrp(), sid)
    # init child in our process group -> ours
    assert bench._is_orphaned_ours(999999, 1, os.getpgrp(), sid)
    # init child in a foreign pgrp with no readable cmdline -> external
    assert not bench._is_orphaned_ours(999999, 1, os.getpgrp() + 7, sid)
    # a foreign-pgrp orphan in ANOTHER login session is never probed by
    # cmdline: a pyspark.daemon leaked by a previous crashed session
    # must stay external or it hides genuine contention
    assert not bench._is_orphaned_ours(1, 1, os.getpgrp() + 7, sid + 9)
    # our own pid must not self-claim via the orphan rule (it is the
    # tree root already; double-claiming is harmless but dishonest)
    assert not bench._is_orphaned_ours(me, 1, os.getpgrp(), sid)


def test_orphaned_descendant_cpu_stays_ours():
    """Live end-to-end: a busy-looping grandchild whose parent exited
    (reparented to init/subreaper, same pgrp) must stay attributed to
    this tree — before the fix its CPU counted as external share and
    could falsely trip contended_end on a clean run."""
    import os
    import subprocess
    import sys as _sys
    import tempfile
    import time as _time

    bench = _load_bench()
    with tempfile.NamedTemporaryFile(suffix=".pid", delete=False) as fh:
        pid_file = fh.name
    # parent spawns a busy grandchild and exits immediately
    code = (
        "import os,sys\n"
        "pid = os.fork()\n"
        "if pid == 0:\n"
        "    open(sys.argv[1], 'w').write(str(os.getpid()))\n"
        "    t = 0\n"
        "    import time\n"
        "    end = time.time() + 10\n"
        "    while time.time() < end:\n"
        "        t += 1\n"
        "else:\n"
        "    os._exit(0)\n"
    )
    subprocess.run([_sys.executable, "-c", code, pid_file], check=True)
    _time.sleep(0.3)  # let the parent exit (orphaning the child)
    with open(pid_file) as fh:
        orphan_pid = int(fh.read())
    try:
        with open(f"/proc/{orphan_pid}/stat") as fh:
            rest = fh.read().rsplit(")", 1)[1].split()
        assert int(rest[1]) != os.getpid()  # genuinely reparented away
        t0 = bench._proc_tree_cpu_sec()
        _time.sleep(1.0)  # we idle; only the orphan burns CPU
        t1 = bench._proc_tree_cpu_sec()
        assert t1 - t0 > 0.5, (
            "orphaned descendant CPU not attributed to our tree:"
            f" delta {t1 - t0:.2f}s over a 1s busy window"
        )
    finally:
        try:
            os.kill(orphan_pid, 9)
        except OSError:
            pass
        os.unlink(pid_file)


def test_contract_line_fits_the_driver_tail_window():
    """The driver records only the last ~2000 chars of bench output and
    json-parses the JSON line found there: r11's 50-query line fit
    (BENCH_r11.json has machine-readable `parsed`), r12's 60-query line
    overflowed and the driver recorded `parsed: None` with a truncated
    tail. The contract line must stay inside the window with headroom —
    if this gate trips, move more detail to a prefixed line the way the
    longdoc rows were."""
    import json

    bench = _load_bench()
    queries = {n: 123.456 for n in bench.HEADLINE}
    queries["skew_join_plain"] = 123.456
    queries["skew_join_salted"] = 123.456
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 123.456,
            "unit": "sec",
            "queries": queries,
            "sf": 0.1,
            "trusted": False,
            "external_cpu_share": 0.1234,
            "steal_share": 0.1234,
            "contended_end": False,
            "n_runs": 3,
            "run_totals": [123.456, 123.456, 123.456],
            "longdoc_total": 123.456,
            "longdoc_fixture": "82477c87dd01",
            "load_start": [10.12, 10.12, 10.12],
            "load_end": [10.12, 10.12, 10.12],
            "cpus": 32,
        },
        separators=(",", ":"),
    )
    assert len(line) < 1900, (
        f"contract line {len(line)} chars — the driver's 2000-char"
        " tail window truncates it; split detail off the final line"
    )
