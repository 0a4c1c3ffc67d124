"""Driver simulation: load __spark_entry__.py fresh BY FILE PATH (as the
driver does), smoke entry(), then run every queries()[name] at sf0.01 and
compare against oracle_sql()[name] on DuckDB (order-insensitive,
column-name-sorted value compare). Thread-parallel like the pytest sweep.

Runs as TWO processes (VERDICT r12 'What's wrong' #5): the outer
wrapper re-execs itself with --inner, tees the merged stdout+stderr
live, and at exit scans the full capture for exception incidents — each
is reported by its HEADLINE (first line + the query context nearest
above it), never as a bare stack tail, and classified against the
documented streaming-teardown allowlist (the state-store unload race a
stopped streaming query can log AFTER its census already matched, and
the benign 'Aborting job' from neardup's data-complete stop). The
wrapper exits nonzero on any UNATTRIBUTED incident even when all
queries matched, so noise and failure can never be confused in a saved
log."""

import importlib.util
import re
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

# stderr-noise allowlist: incidents whose headline-or-body matches one
# of these are the DOCUMENTED benign teardown signatures. Scoping
# decision (review r13): the job/task-abort shapes are allowlisted
# GLOBALLY, not per-query — worker interleaving makes context lines
# unreliable, and an abort that actually matters fails its query's
# oracle compare, so rc goes nonzero regardless of this scan.
# TIGHTENED (ADVICE r13): "an abort that matters fails its query" only
# fully holds for ORACLE-BACKED queries — a rows-only query's check is
# count() >= 0, so an abort Spark transparently retried there would
# have stayed green. The abort shapes (ABORT_INCIDENTS below) therefore
# attribute ONLY when the block falls inside the documented
# streaming-teardown WINDOW: either the block itself co-matches a
# streaming/state-store/write signature, or another co-matching
# incident logged within ±_WINDOW_SECONDS (timestamped lines) or
# ±_WINDOW_LINES of capture (untimestamped) — the r13 observation was
# the whole abort cluster landing in the SAME SECOND as the allowed
# job abort. A bare abort with no such neighbour is UNATTRIBUTED and
# fails the sim even when all queries verified.
ALLOWED_INCIDENTS = [
    # state-store unload / task-completion listener race after a
    # streaming query is stopped (streaming/neardup.py drain contract)
    r"StateStore|state store|invokeTaskCompletionListeners"
    r"|onTaskCompletion|mapPartitionsWithStateStore",
    # executor interrupted while the session shuts down
    r"InterruptedException",
    # the stop's job-group cancel can interrupt an in-flight broadcast
    # WRITE mid-batch: TorrentBroadcast logs the store failure on its
    # own timestamped ERROR line (single-line block after the r13
    # same-second split), with the InterruptedException stack in the
    # NEXT block — observed in the r13 m3 sim, same cancel event as
    # the allowed job abort one line below it.
    r"TorrentBroadcast: Store broadcast \S+ fail",
]

# neardup's data-complete stop aborts one in-flight empty batch by
# design; that write never enters _spark_metadata. The same abort
# event logs three shapes: 'FileFormatWriter: Aborting job <uuid>',
# per-task 'Utils: Aborting task', and the task-attempt notice
# 'FileFormatWriter: Job: job_N, Task: task_N, Task attempt ...
# aborted' (observed as one cluster in the r13 sim, all within the
# same second as the allowed job abort). 'Utils: Aborting task' is
# listed explicitly: under two-worker interleaving its stack block
# (which carries the attributable StateStore/write frames) can detach
# from the headline, leaving the bare per-task abort line — these
# bare blocks are exactly what the teardown-window co-match covers.
ABORT_INCIDENTS = [
    r"Aborting job|Aborting task|SparkException.*[Jj]ob aborted"
    r"|FileFormatWriter: Job: job_\d+.*Task.*abort",
]

# An abort block (or a neighbour vouching for one) counts as inside
# the streaming-teardown window when it carries one of these frames —
# the streaming write/state machinery the documented benign aborts
# always travel with. Honest residual: FileFormatWriter also appears
# in BATCH write aborts, so a batch abort Spark retried inside a
# rows-only query can still self-attribute — much narrower than the
# pre-r14 unconditional allowlist (a bare 'Aborting task' anywhere),
# and removing FileFormatWriter would false-red the documented
# streaming job-abort shape, which is not reliably accompanied by a
# same-second StateStore block.
_STREAM_SIGNATURE = re.compile(
    r"StateStore|state store|FileFormatWriter|_spark_metadata"
    r"|streaming|StreamExecution|MicroBatch|TorrentBroadcast"
    r"|invokeTaskCompletionListeners|mapPartitionsWithStateStore"
)
_WINDOW_SECONDS = 3
_WINDOW_LINES = 80

_TS = re.compile(r"^(\d\d)/(\d\d)/(\d\d) (\d\d):(\d\d):(\d\d) ")


def _block_epoch(line):
    """Calendar-exact ordinal (seconds) for a timestamped Spark log
    line (None for untimestamped Python tracebacks). A real calendar
    conversion, not a hand-folded ordinal (ADVICE r14: folding only
    day/hour/min/sec made a sim run that crossed a month boundary
    compare epochs ~days apart, missing the ±3 s co-match and
    false-failing a benign abort cluster). timegm treats the wall
    clock as UTC — a TZ-FREE monotone mapping, so the verdict cannot
    depend on the scanning box's timezone and a naive timestamp()'s
    DST fold cannot reopen the same hole one hour per year. The
    residual DST ambiguity lives in the LOG's wall clock itself
    (a fall-back repeats an hour) and is undecidable from the text."""
    import calendar

    m = _TS.match(line)
    if not m:
        return None
    y, mo, d, h, mi, s = (int(g) for g in m.groups())
    try:
        return calendar.timegm((2000 + y, mo, d, h, mi, s, 0, 0, 0))
    except ValueError:  # malformed-but-matching timestamp
        return None

_INCIDENT_START = re.compile(
    r"^Traceback \(most recent call last\)"
    r"|^\d\d/\d\d/\d\d \d\d:\d\d:\d\d ERROR "
    r"|^(Caused by: )?[A-Za-z_$][\w.$]*(Exception|Error)(:|$)"
)
# A timestamped ERROR or a fresh Python traceback always OPENS A NEW
# incident — it must never be absorbed into the previous block, or one
# allowed teardown line would attribute an adjacent unrelated failure
# logged in the same second (review finding r13). Bare exception-class
# lines and Caused-by stay continuations: they are the body of the
# headline above them.
_INCIDENT_BREAK = re.compile(
    r"^Traceback \(most recent call last\)"
    r"|^\d\d/\d\d/\d\d \d\d:\d\d:\d\d ERROR "
)
_INCIDENT_CONT = re.compile(
    r"^\s+at |^Caused by: |^\s+\.\.\. \d+ more|^\s+File \"|^    "
)
_QUERY_LINE = re.compile(r"^\[\s*\d+/\d+\] ")


def _scan_incidents(lines):
    """Group captured lines into exception incidents; return a list of
    (headline, query_context, attributed_rule_or_None). Non-abort
    allowlist rules attribute each block INDEPENDENTLY; abort-shaped
    blocks (ABORT_INCIDENTS) additionally need the streaming-teardown
    window — an in-block stream signature, or a stream-signed
    neighbour incident within ±_WINDOW_SECONDS / ±_WINDOW_LINES."""
    blocks = []  # (headline, ctx, text, line_idx, epoch)
    last_query = "(before first query)"
    i = 0
    while i < len(lines):
        line = lines[i]
        if _QUERY_LINE.match(line):
            last_query = line.split("]", 1)[1].strip()[:80]
        if _INCIDENT_START.match(line) and not line.startswith(
            "Caused by"
        ):
            block = [line]
            j = i + 1
            while j < len(lines) and not _INCIDENT_BREAK.match(
                lines[j]
            ) and (
                _INCIDENT_CONT.match(lines[j])
                or _INCIDENT_START.match(lines[j])
            ):
                block.append(lines[j])
                j += 1
            text = "\n".join(block)
            blocks.append(
                (line.strip()[:160], last_query, text, i, _block_epoch(line))
            )
            i = j
        else:
            i += 1

    stream_signed = [
        (idx, epoch)
        for _h, _c, text, idx, epoch in blocks
        if _STREAM_SIGNATURE.search(text)
    ]

    def _in_teardown_window(idx, epoch):
        for s_idx, s_epoch in stream_signed:
            if epoch is not None and s_epoch is not None:
                if abs(epoch - s_epoch) <= _WINDOW_SECONDS:
                    return True
            elif abs(idx - s_idx) <= _WINDOW_LINES:
                return True
        return False

    incidents = []
    for headline, ctx, text, idx, epoch in blocks:
        rule = next(
            (p for p in ALLOWED_INCIDENTS if re.search(p, text)), None
        )
        if rule is None:
            abort = next(
                (p for p in ABORT_INCIDENTS if re.search(p, text)), None
            )
            if abort is not None:
                if _STREAM_SIGNATURE.search(text):
                    rule = abort + " [stream-signed]"
                elif _in_teardown_window(idx, epoch):
                    rule = abort + " [teardown-window]"
        incidents.append((headline, ctx, rule))
    return incidents


def _outer() -> int:
    """Tee the inner run; attribute every stderr incident at exit."""
    import subprocess

    proc = subprocess.Popen(
        [sys.executable, __file__, "--inner"],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        errors="replace",
    )
    captured = []
    for line in proc.stdout:
        sys.stdout.write(line)
        sys.stdout.flush()
        captured.append(line.rstrip("\n"))
    rc = proc.wait()

    incidents = _scan_incidents(captured)
    unattributed = [x for x in incidents if x[2] is None]
    print(f"\nstderr incidents: {len(incidents)} total,"
          f" {len(incidents) - len(unattributed)} attributed"
          f" (teardown allowlist), {len(unattributed)} unattributed",
          flush=True)
    for headline, ctx, rule in incidents:
        tag = "ALLOWED" if rule else "UNATTRIBUTED"
        print(f"  [{tag}] near '{ctx}': {headline}", flush=True)
    if unattributed and rc == 0:
        print("FAIL: unattributed stderr incident(s) above", flush=True)
        return 1
    return rc


sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

SF = "/root/testdata/sf0.01"

# Rotation-health invariant (VERDICT r13 #5): the scheduler keeps every
# registry row's newest driver evidence within this many rounds by
# construction (never-verified first, then oldest-green-row first, 50
# slots/round). Make that a CHECKED invariant so an r8-style tail can't
# silently re-accumulate: the sim fails when any recorded row's newest
# driver round is more than MAX_ROW_AGE_ROUNDS behind the newest record
# on disk. Fresh (never-recorded) queries are exempt — they sort ahead
# of every recorded row in the next driver prefix by construction.
MAX_ROW_AGE_ROUNDS = 4


def rotation_health(last_by_query, current_round, max_age=MAX_ROW_AGE_ROUNDS):
    """Return the list of (query, age) violations — rows whose newest
    driver evidence is OLDER than max_age rounds at current_round."""
    return sorted(
        (name, current_round - rnd)
        for name, rnd in last_by_query.items()
        if current_round - rnd > max_age
    )


def _inner() -> int:

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    records = list(mod._iter_records())
    if records:
        current_round = max(rnd for rnd, _rows in records)
        last = mod._last_checked_round(records)
        ages = sorted({current_round - r for r in last.values()})
        hist = {
            a: sum(1 for r in last.values() if current_round - r == a)
            for a in ages
        }
        print(f"rotation: newest record r{current_round}, age histogram"
              f" {hist}", flush=True)
        violations = rotation_health(last, current_round)
        if violations:
            print("FAIL: rotation-health violations (row age >"
                  f" {MAX_ROW_AGE_ROUNDS} rounds): {violations[:20]}",
                  flush=True)
            return 1

    from economic_data_project_spark.session import get_spark  # noqa: E402
    from tests.conftest import compare_with_oracle, duckdb_connect  # noqa: E402

    spark = get_spark(app_name="driver-sim")

    t0 = time.time()
    edf = mod.entry(spark)
    rows = edf.collect()
    print(f"entry(): {len(rows)} rows, schema={edf.schema.simpleString()[:120]}", flush=True)

    queries = mod.queries()
    oracles = mod.oracle_sql()
    con = duckdb_connect(SF)
    lock = threading.Lock()
    results = {}


    def run(name):
        cur = con.cursor()
        try:
            if name in oracles:
                ok, msg = compare_with_oracle(
                    spark, queries[name], oracles[name], SF, con=cur
                )
            else:
                n = queries[name](spark, SF).count()
                ok, msg = n >= 0, f"rows-only ({n} rows)"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        with lock:
            results[name] = (ok, msg)
            tag = "MATCH" if (ok and name in oracles) else (
                "ROWS" if ok else "FAIL"
            )
            print(f"[{len(results):3}/{len(queries)}] {tag:5} {name}: {msg}"[:200], flush=True)


    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(run, sorted(queries)))

    n_fail = sum(1 for ok, _ in results.values() if not ok)
    n_match = sum(1 for n, (ok, _) in results.items() if ok and n in oracles)
    n_rows = sum(1 for n, (ok, _) in results.items() if ok and n not in oracles)
    print(
        f"\nTOTAL {len(results)} queries: {n_match} MATCH, {n_rows} rows-only,"
        f" {n_fail} FAIL in {time.time()-t0:.0f}s"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(_inner() if "--inner" in sys.argv else _outer())
