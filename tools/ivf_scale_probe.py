"""IVF scale-tier probe: run ann_ivf_topk ABOVE the 200k cutover and
pin planted top-1 recall (r11 measured the K~sqrt(n) sizing this way;
r12 re-runs it because the sizing moved into a driver-side probe and
the centroid seeding to a smallest-K TakeOrdered — the driver's oracle
only sees below the cutover, so the scale path needs its own record).

Corpus: n dense-id vectors, dim 64; each of the 10 probe-set queries
(vec_id < 10) gets a planted near-identical partner at vec_id 10+i, so
its true top-1 neighbor is known. IVF must place query and partner in
the same coarse cell and return the partner at rank 1.

Run:  python tools/ivf_scale_probe.py [n]
Log:  tools/bench_snapshots/r12_ivf_scale.log
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from economic_data_project_spark.registry import all_queries
from economic_data_project_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
# Optional surface filter (2nd arg): run one surface in a FRESH
# session to separate its cost from same-session residue of the
# other — the default both-in-one-session run leaves the first
# surface's cached frames resident while the second executes.
SURFACES = tuple(
    s
    for s in ("ann_ivf_topk", "ann_ivf_topk_int8")
    if len(sys.argv) <= 2 or s == sys.argv[2]
)
DIM = 64
# Round-neutral self-log (the simhash64 probe precedent): appending
# to a past round's recorded artifact retro-edits evidence; copy lines
# into a per-round r{N}_... snapshot when recording a run.
LOG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "bench_snapshots",
    "ivf_scale_probe_runs.log",
)


def main() -> None:
    rng = np.random.RandomState(9)
    V = rng.normal(size=(N, DIM)).astype(np.float64)
    for i in range(10):  # partner of query i sits at vec_id 10 + i
        V[10 + i] = V[i] + 0.01 * rng.normal(size=DIM)
    out = tempfile.mkdtemp(prefix="spark_graft_ivf_")
    spark = get_spark(app_name="ivf-scale-probe")
    # write through Spark with 32 splits: a single pandas-written
    # parquet file scans as ~2 input partitions (130MB / 128MB
    # maxPartitionBytes) and the whole probe then runs ~2-wide — the
    # first run of this probe crawled exactly that way
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(N, dtype=np.int64),
            "embedding": [list(map(float, v)) for v in V],
            "label": (np.arange(N) % 5).astype(np.int64),
        }
    )
    spark.createDataFrame(pdf).repartition(32).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "embeddings.parquet"))
    failures = []
    with open(LOG, "a") as fh:
        # the float IVF (Lloyd-refined) and the int8 IVF-SQ composition
        # both carry the sqrt-K sizing above the cutover — probe both
        for qname in SURFACES:
            t0 = time.time()
            rows = (
                all_queries()[qname](spark, out)
                .orderBy("query_id", "rank")
                .collect()
            )
            sec = round(time.time() - t0, 1)
            top1 = {
                r.query_id: r.neighbor_id for r in rows if r.rank == 1
            }
            hits = sum(1 for i in range(10) if top1.get(i) == 10 + i)
            for r in (
                {"q": qname, "n": N, "sec": sec, "rows": len(rows)},
                {"q": qname, "top1_planted_hits": hits, "eligible": 10},
            ):
                fh.write(json.dumps(r) + "\n")
                print(json.dumps(r), flush=True)
            if hits != 10:
                failures.append(f"{qname}: planted top-1 {hits}/10")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    assert not failures, failures


if __name__ == "__main__":
    main()
