"""SemDeDup GEMM skew probe: prove the row-tiled pair kernel survives a
HOT cluster that the one-shot c x c kernel could not (VERDICT r12
ADVICE #2). One-Lloyd-step k-means bounds the MEAN cluster size only;
this corpus engineers the worst case the sizing policy permits — a
majority of the corpus collapsing into ONE cluster — and runs the full
query through the GEMM tier.

Corpus: n vectors, dim 32. Seeds are the K smallest vec_ids, so the
id layout plants EXACTLY ONE cone seed: id 0 is the hot direction,
ids 1..K-1 are isotropic anchor directions, and a `hot_frac` majority
of the remaining ids sits in a tight cone around id 0 (intra-cone
cosine ~0.93+ vs ~|0.5| max to any random anchor in dim 32, so the
whole cone argmaxes to seed 0 at both assignment passes). With n=200k
and hot_frac=0.6 the hot cluster is ~120k rows: the one-shot kernel's
S/near/better temporaries would be ~120k^2 x (8+1+1) B ~ 144 GB in one
Arrow group — beyond any executor — while the tiled kernel peaks at
~tile x c x 10 B ~ 0.3 GB (tile = 2^25 / c). (A first draft put the
cone FIRST, which made every seed a cone member and split the cone
K ways — max cluster 15k; the layout above is the fix.)

Planted recall: exact near-copies inside the hot cone must come out
flagged (cosine ~0.9999 >> eps), proving the tiles' OR-accumulation
sees every dominating row across tile boundaries.

Usage: python tools/semdedup_skew_probe.py [n] [hot_frac] [n_planted]
Defaults 200000 0.6 200. Log the printed lines to tools/bench_snapshots/
when recording a run."""

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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.6
    n_dup = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    dim = 32
    rng = np.random.RandomState(7)

    from economic_data_project_spark.registry import all_queries
    from economic_data_project_spark.session import get_spark
    from economic_data_project_spark.similarity import semdedup as sd

    k_planned = min(sd._IVF_K_CAP, n // sd._TARGET_CLUSTER)
    hot_dir = rng.normal(size=dim)
    hot_dir /= np.linalg.norm(hot_dir)
    n_anchor = k_planned - 1  # seeds 1..K-1: spread directions
    n_hot = int(n * hot_frac) - n_dup - 1  # cone members past the seeds
    n_cold = n - 1 - n_anchor - n_hot - n_dup
    anchors = rng.normal(size=(n_anchor, dim))
    # tight cone: base + small noise keeps intra-cone cosine ~0.93+
    hot = hot_dir[None, :] + 0.05 * rng.normal(size=(n_hot, dim))
    cold = rng.normal(size=(n_cold, dim))
    dup_src = rng.choice(n_hot, size=n_dup, replace=False)
    dups = hot[dup_src] + 1e-4 * rng.normal(size=(n_dup, dim))
    # id layout: [hot seed, anchors, cone, cold, cone copies]
    vecs = np.vstack(
        [hot_dir[None, :], anchors, hot, cold, dups]
    ).astype(np.float32)
    dup_src = dup_src + 1 + n_anchor  # cone block offset
    tmp = tempfile.mkdtemp(prefix="spark_graft_semdedup_skew_")
    pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [v.tolist() for v in vecs],
            "label": [i % 10 for i in range(n)],
        }
    ).to_parquet(os.path.join(tmp, "embeddings.parquet"), index=False)

    k = min(sd._IVF_K_CAP, n // sd._TARGET_CLUSTER)
    hot_c = 1 + n_hot + n_dup
    oneshot_gb = hot_c * hot_c * 10 / 1e9
    tile = max(1, sd._GEMM_TILE_ELEMS // hot_c)
    tiled_gb = tile * hot_c * 10 / 1e9
    splits = -(-hot_c // sd._SPLIT_CAP)
    print(
        f"n={n} hot_cluster~{hot_c:,} K={k} (mean target "
        f"{sd._TARGET_CLUSTER}) -> one-shot kernel temporaries "
        f"~{oneshot_gb:.1f} GB; tiled (tile={tile}) ~{tiled_gb:.2f} GB"
    )
    print(
        f"cap-split (r14): _SPLIT_CAP={sd._SPLIT_CAP} -> splits="
        f"{splits}, {splits * splits} pair-groups replace the single"
        f" {hot_c:,}^2 task (r13 baseline: 593.1 s serialized)"
    )

    spark = get_spark(app_name="semdedup-skew-probe")
    t0 = time.time()
    out = (
        all_queries()["dedup_semantic_semdedup"](spark, tmp)
        .toPandas()
        .set_index("vec_id")
    )
    elapsed = time.time() - t0

    copy_ids = np.arange(n - n_dup, n)
    flagged_pairs = sum(
        1
        for s, c in zip(dup_src, copy_ids)
        if out.loc[int(s), "is_dup"] or out.loc[int(c), "is_dup"]
    )
    sizes = out.groupby("cluster").size()
    print(
        f"elapsed={elapsed:.1f}s rows={len(out)} "
        f"max_cluster={int(sizes.max()):,} (skew ratio "
        f"{sizes.max() / max(1, n // k):.0f}x the mean target) "
        f"flagged={int(out.is_dup.sum()):,} "
        f"planted recall {flagged_pairs}/{n_dup}"
    )
    shutil.rmtree(tmp, ignore_errors=True)
    assert len(out) == n
    assert flagged_pairs == n_dup, "planted recall failed"
    assert sizes.max() >= 0.5 * hot_c, "skew did not materialize"
    print("PROBE OK")


if __name__ == "__main__":
    main()
