"""SemDeDup scale probe: exercise the size-aware K tier end-to-end
above its 16384-vector cutover on a synthetic corpus with planted
semantic duplicates, and measure what the sizing policy is for —
within-cluster candidate-pair volume staying ~linear in n instead of
the fixed-K quadratic.

Usage: python tools/semdedup_scale_probe.py [n_vectors] [n_planted]
           [--fixed-k] [--one-level]
Defaults: 60000 vectors (K = 58 past the cutover), 200 planted
near-duplicates; --fixed-k monkeypatches the cutover away to measure
the counterfactual K=16 cost on the same corpus; --one-level
monkeypatches the two-level boundary away so a >524k corpus runs the
one-level assignment counterfactual. Writes nothing
outside /tmp; log the printed lines to tools/bench_snapshots/ when
recording a run.

Recall check: every planted copy is a tiny perturbation of a base
vector (cosine ~0.9999 >> eps 0.40), so at least one member of each
planted pair must come out flagged is_dup. Exactly-one-dropped is
reported as a diagnostic, NOT asserted: on an isotropic random corpus
the 0.40 threshold is aggressive (most vectors have SOME >=eps
same-cluster neighbor — measured 77% flagged at 60k), so a planted
pair's base vector is often itself dominated by a third vector and
both members legitimately drop. The threshold is a data-dependent
deployment knob (module docstring); recall on planted near-dups is
the contract this probe pins."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pandas as pd

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    flags = {"--fixed-k", "--one-level"}
    args = [a for a in sys.argv[1:] if a not in flags]
    fixed_k = "--fixed-k" in sys.argv[1:]
    one_level = "--one-level" in sys.argv[1:]
    n = int(args[0]) if len(args) > 0 else 60_000
    n_dup = int(args[1]) if len(args) > 1 else 200
    dim = 64
    rng = np.random.RandomState(42)

    from economic_data_project_spark.registry import all_queries
    from economic_data_project_spark.session import get_spark
    from economic_data_project_spark.similarity import semdedup as sd

    if fixed_k:
        sd._SCALE_MIN = n + 1  # counterfactual: keep K at 16
    if one_level:
        sd._TWO_LEVEL_MIN = n + 1  # counterfactual: one-level assign

    base = rng.normal(size=(n - n_dup, dim)).astype(np.float32)
    dup_src = rng.choice(n - n_dup, size=n_dup, replace=False)
    dups = base[dup_src] + 1e-3 * rng.normal(size=(n_dup, dim)).astype(
        np.float32
    )
    vecs = np.vstack([base, dups])
    tmp = tempfile.mkdtemp(prefix="spark_graft_semdedup_probe_")
    pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [v.tolist() for v in vecs],
            "label": [i % 10 for i in range(n)],
        }
    ).to_parquet(os.path.join(tmp, "embeddings.parquet"), index=False)

    k = (
        sd._K
        if n <= sd._SCALE_MIN
        else min(sd._IVF_K_CAP, n // sd._TARGET_CLUSTER)
    )
    tier = (
        "fixed-K16" if fixed_k
        else "one-level" if (n <= sd._TWO_LEVEL_MIN or one_level)
        else "two-level"
    )
    print(
        f"n={n} planted={n_dup} -> K={k} tier={tier} "
        f"(expected within-cluster pairs ~ n^2/2K = "
        f"{n * n // (2 * k):,}; fixed-K16 would be {n * n // 32:,})"
    )

    spark = get_spark(app_name="semdedup-probe")
    t0 = time.time()
    out = (
        all_queries()["dedup_semantic_semdedup"](spark, tmp)
        .toPandas()
        .set_index("vec_id")
    )
    elapsed = time.time() - t0
    n_flagged = int(out.is_dup.sum())

    # planted recall: exactly one member of each (src, copy) pair dropped
    copy_ids = np.arange(n - n_dup, n)
    pair_ok = sum(
        1
        for s, c in zip(dup_src, copy_ids)
        if bool(out.loc[int(s), "is_dup"]) != bool(out.loc[int(c), "is_dup"])
    )
    both_kept = sum(
        1
        for s, c in zip(dup_src, copy_ids)
        if not out.loc[int(s), "is_dup"] and not out.loc[int(c), "is_dup"]
    )
    print(
        f"elapsed={elapsed:.1f}s rows={len(out)} flagged={n_flagged} "
        f"planted pairs with exactly-one-dropped: {pair_ok}/{n_dup} "
        f"(both-kept misses: {both_kept})"
    )
    shutil.rmtree(tmp, ignore_errors=True)
    assert len(out) == n
    assert both_kept == 0, "planted recall failed"
    print("PROBE OK")


if __name__ == "__main__":
    main()
