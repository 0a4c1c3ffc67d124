"""Steady-state same-session A/B: do the shared minhash caches
(shingles, bands, verified pairs) benefit from eager warm() fills?

Hypothesis from tools/ab_incremental.py (r11): concurrent readers of an
UNFILLED cache each recompute it, so the self-joined band cache and the
twice-read shingle cache pay the expensive signature transforms 2-4x on
a query's first action. Variant B warms EVERY cache dedup.py registers
(monkeypatched registration) so fills happen serially at build; variant
A is current code. Lanes are cold (registry + SQL cache freed), 3 reps,
both orderings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from economic_data_project_spark import caches
from economic_data_project_spark.caches import free_session_caches
from economic_data_project_spark.catalog import load_table
from economic_data_project_spark.session import get_spark, tune_session
from economic_data_project_spark.text import dedup as D
from economic_data_project_spark.text import screening, selection

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = {
    "dedup_minhash_lsh": D.dedup_minhash_lsh,
    "dedup_incremental_minhash": D.dedup_incremental_minhash,
    "corpus_keep_list": screening.corpus_keep_list,
    "corpus_training_manifest": selection.corpus_training_manifest,
}

_ORIG_RSC = caches.register_session_cache


def _warming_rsc(df):
    return caches.warm(_ORIG_RSC(df))


def set_variant(warmed: bool) -> None:
    # dedup.py imported the name at module load; patch ITS binding
    D.register_session_cache = _warming_rsc if warmed else _ORIG_RSC


def lane(spark, label, out):
    for qname, fn in QUERIES.items():
        free_session_caches()
        spark.catalog.clearCache()
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(round(time.perf_counter() - t0, 3))
        out.setdefault(label, {}).setdefault(qname, []).append(reps)


def main() -> None:
    load = os.getloadavg()
    spark = get_spark(app_name="ab-warm-dedup")
    tune_session(spark)
    load_table(spark, SF_DIR, "documents").limit(1).collect()
    out: dict = {}
    for label, warmed in (
        ("warmed", True),
        ("current", False),
        ("current", False),
        ("warmed", True),
    ):
        set_variant(warmed)
        lane(spark, label, out)
    set_variant(False)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "load_start": [round(x, 2) for x in load],
                "load_end": [round(x, 2) for x in os.getloadavg()],
                "reps": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
