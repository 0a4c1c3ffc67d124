"""Candidate-volume probe for the 64-bit simhash tier (VERDICT r11 #2).

The 32-bit simhash contract saturates around ~1M docs: unrelated docs
land within hamming 3 with p ~ 5.5e3/2^32, and the 4x8-bit bands feed
~n^2 * 4 / 2^8 junk candidates to the verifier. The 64-bit/4x16
successor (`dedup_simhash64`) bounds both. This probe MEASURES that at
1.2M synthetic docs instead of assuming it (same discipline as r11's
emb-LSH and IVF probes):

1. band-bucket junk-candidate volume (sum over buckets of c*(c-1)/2)
   for the 32-bit 4x8 scheme vs the 64-bit 4x16 scheme — bucket counts
   only, because EXECUTING the 32-bit band join at this scale is
   exactly the blowup the tier replaces;
2. the 64-bit surface run END TO END (band join + verify), with 1000
   planted exact-copy pairs: recall must be 1000/1000 (pigeonhole) and
   false (non-planted) hamming<=3 pairs ~0 (expected ~0.002 at 1.2M
   docs under the 2^-64 collision model);
3. a NumPy pigeonhole check on planted hamming-3 SIGNATURE pairs
   (text-level hamming<=3 pairs need multi-thousand-token docs; the
   band-recall guarantee is a property of signatures, so it is pinned
   at the signature level).

Run:  python tools/simhash64_probe.py [n_docs]
Log:  tools/bench_snapshots/simhash64_probe_runs.log (self-appended)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from economic_data_project_spark.registry import all_queries
from economic_data_project_spark.session import get_spark
from economic_data_project_spark.text.dedup import (
    _simhash64_df,
    _simhash_df,
)

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
N_PLANTED = 1000  # docs 0..1999 are 1000 exact-copy pairs (2k, 2k+1)
TOKENS_PER_DOC = 60

# Round-neutral self-log: appending to a PAST round's recorded
# artifact retro-edits evidence (the r13 2.4M run landed in the r12
# log before this fix); copy lines from here into a per-round
# r{N}_... snapshot when recording a run.
LOG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "bench_snapshots",
    "simhash64_probe_runs.log",
)


def log(msg: str) -> None:
    print(msg, flush=True)
    with open(LOG, "a") as fh:
        fh.write(msg + "\n")


def gen_corpus(spark, out_dir: str) -> None:
    """Deterministic synthetic corpus: docs 2k/2k+1 share a seed for
    k < N_PLANTED (exact copies -> hamming 0); everything else gets its
    own seed over a ~100k-token space, so unrelated signatures are
    ~uniform 64-bit values. Letters-only tokens (the tokenizer is
    [a-z]+), same trick as bench.py's longdoc generator."""
    digit_tok = "translate(cast({n} as string), '0123456789', 'abcdefghij')"
    seed = (
        f"CASE WHEN id < {2 * N_PLANTED} THEN cast(id / 2 as bigint)"
        " ELSE id END"
    )
    # modulus ~2^30 (prime): with a small modulus like 99991 the seed
    # multiplier wraps and docs repeat every (modulus) ids — the first
    # probe run surfaced ~6.6M UNINTENDED exact-dup pairs that way
    # (66 pairs per repeated doc x 99991 docs), which the operator
    # correctly found. 982451653/7919 >> 1.2M seeds keeps every doc
    # distinct.
    tok = "concat('w', " + digit_tok.format(
        n=f"pmod(({seed}) * 7919 + i * 104729 + 37 * i * i, 982451653)"
    ) + ")"
    (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.expr(
                    f"transform(sequence(1, {TOKENS_PER_DOC}), i -> {tok})"
                ),
            ).alias("text"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )


def band_volume(sig_df, n_bands: int, bits: int) -> int:
    """Sum over (band, value) buckets of c*(c-1)/2 — the number of
    candidate pairs the band join would emit before dedup/verify."""
    mask = (1 << bits) - 1
    banded = sig_df.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}), i ->"
                f" struct(i as band_id,"
                f" shiftright(simhash, i * {bits}) & {mask} as band_val))"
            )
        ).alias("b")
    ).select("b.band_id", "b.band_val")
    row = (
        banded.groupBy("band_id", "band_val")
        .count()
        .agg(F.sum(F.expr("count * (count - 1) / 2")).alias("vol"))
        .head()
    )
    return int(row["vol"] or 0)


def pigeonhole_numpy_check() -> None:
    """Planted hamming<=3 SIGNATURE pairs must collide in >= 1 of the
    4x16 bands (pigeonhole: 3 flipped bits can dirty at most 3 of 4
    bands). Independent of Spark entirely."""
    rng = np.random.RandomState(42)
    n = 200_000
    # two 32-bit halves; the high half's shift into the sign region is
    # the intended bit-pattern wraparound
    sigs = (
        rng.randint(0, 1 << 32, size=n, dtype=np.int64) << np.int64(32)
    ) | rng.randint(0, 1 << 32, size=n, dtype=np.int64)
    partners = sigs[: n // 2].copy()
    for i in range(len(partners)):
        for b in rng.choice(64, size=rng.randint(0, 4), replace=False):
            partners[i] ^= np.int64(1) << np.int64(b)
    def bands(x):
        return [(x >> np.int64(16 * i)) & np.int64(0xFFFF) for i in range(4)]
    collide = np.zeros(len(partners), dtype=bool)
    for ba, bb in zip(bands(sigs[: n // 2]), bands(partners)):
        collide |= ba == bb
    assert collide.all(), "pigeonhole violated"
    log(
        f"numpy pigeonhole: {len(partners)} planted hamming<=3 signature"
        " pairs all collide in >=1 of the 4x16 bands (guarantee holds)"
    )


def main() -> None:
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    log(f"=== simhash64 probe: n_docs={N_DOCS}, {TOKENS_PER_DOC} tok/doc,"
        f" {N_PLANTED} planted exact-copy pairs ===")
    pigeonhole_numpy_check()

    spark = get_spark(app_name="simhash64-probe")
    out_dir = tempfile.mkdtemp(prefix="spark_graft_sh64_")
    t0 = time.time()
    gen_corpus(spark, out_dir)
    log(f"corpus generated in {time.time() - t0:.1f}s -> {out_dir}")

    try:
        t0 = time.time()
        sig64 = _simhash64_df(spark, out_dir).cache()
        n64 = sig64.count()
        vol64 = band_volume(sig64, 4, 16)
        log(
            f"64-bit 4x16: {n64} signatures, band candidate volume"
            f" {vol64:,} ({time.time() - t0:.1f}s)"
            f" [theory ~ n^2/2 * 4/2^16 = {int(n64 * n64 / 2 * 4 / 65536):,}"
            " for uniform signatures; planted copies add their own]"
        )

        t0 = time.time()
        sig32 = _simhash_df(spark, out_dir).cache()
        sig32.count()
        vol32 = band_volume(sig32, 4, 8)
        log(
            f"32-bit 4x8 : band candidate volume {vol32:,}"
            f" ({time.time() - t0:.1f}s)"
            f" [theory ~ n^2/2 * 4/2^8 = {int(n64 * n64 / 2 * 4 / 256):,}]"
            f" -> the 64-bit tier cuts candidates {vol32 / max(vol64, 1):,.0f}x"
        )
        sig32.unpersist()

        # end-to-end: the registered 64-bit surface at this scale
        t0 = time.time()
        pairs = all_queries()["dedup_simhash64"](spark, out_dir)
        rows = pairs.collect()
        planted = sum(
            1
            for r in rows
            if r.doc_b == r.doc_a + 1
            and r.doc_a % 2 == 0
            and r.doc_a < 2 * N_PLANTED
        )
        log(
            f"end-to-end dedup_simhash64: {len(rows)} hamming<=3 pairs in"
            f" {time.time() - t0:.1f}s; planted recall {planted}/{N_PLANTED};"
            f" non-planted pairs {len(rows) - planted} (64-bit collision"
            f" model expects ~{n64 * n64 / 2 * 43745 / 2**64:.3f};"
            " 43745 = sum_k<=3 C(64,k))"
        )
        sig64.unpersist()
    finally:
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
