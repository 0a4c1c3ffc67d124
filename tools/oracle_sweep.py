"""Oracle sweep at an arbitrary scale factor: run every declared query
against its DuckDB oracle (order-insensitive, column-name-sorted value
compare — the driver's contract) at a LARGER sf than the driver's
sf0.01, catching scale-dependent divergence (aggregation-order float
drift, overflow, partition-count-sensitive results).

Usage: python tools/oracle_sweep.py [sf_dir]
(default /root/testdata/sf0.1)

Queries whose DECLARED ORACLE is brute-force quadratic in DuckDB
(all-pairs shingle/embedding intersections — hours at 5000 docs) are
skipped: their engines are driver-verified at sf0.01 and value-pinned
by planted-fixture recall tests; the exclusion is about oracle cost,
not engine doubt. r11 result at sf0.1: 143 MATCH + 7 rows-only,
0 FAIL in 510s (tools/bench_snapshots/r11_sf01_oracle_sweep.log).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

# oracles that are O(n^2) in DuckDB (engine side is candidate-pruned;
# the declared SQL is deliberately brute-force for auditability)
QUADRATIC_ORACLES = {
    "dedup_minhash_lsh",
    "ngram_jaccard_nn",
    "dedup_incremental_minhash",
    "dedup_embedding_cosine",
    "dedup_components",
    "corpus_keep_list",
    "leakage_safe_split",
    "corpus_training_manifest",
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from economic_data_project_spark.session import get_spark
    from tests.conftest import compare_with_oracle, duckdb_connect

    spark = get_spark(app_name="oracle-sweep")
    t0 = time.time()
    queries = {
        k: v for k, v in mod.queries().items()
        if k not in QUADRATIC_ORACLES
    }
    oracles = {
        k: v for k, v in mod.oracle_sql().items()
        if k not in QUADRATIC_ORACLES
    }
    con = duckdb_connect(sf)
    lock = threading.Lock()
    results: dict[str, tuple[bool, str]] = {}

    def run(name: str) -> None:
        cur = con.cursor()
        try:
            if name in oracles:
                ok, msg = compare_with_oracle(
                    spark, queries[name], oracles[name], sf, con=cur
                )
            else:
                n = queries[name](spark, sf).count()
                ok, msg = n >= 0, f"rows-only ({n} rows)"
        except Exception as e:  # noqa: BLE001 — sweep must finish
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        with lock:
            results[name] = (ok, msg)
            tag = "MATCH" if (ok and name in oracles) else (
                "ROWS" if ok else "FAIL"
            )
            print(
                f"[{len(results):3}/{len(queries)}] {tag:5} {name}:"
                f" {msg}"[:200],
                flush=True,
            )

    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(run, sorted(queries)))

    n_fail = sum(1 for ok, _ in results.values() if not ok)
    n_match = sum(
        1 for n, (ok, _) in results.items() if ok and n in oracles
    )
    n_rows = sum(
        1 for n, (ok, _) in results.items() if ok and n not in oracles
    )
    print(
        f"\nTOTAL {len(results)} queries: {n_match} MATCH,"
        f" {n_rows} rows-only, {n_fail} FAIL in {time.time()-t0:.0f}s"
        f" (skipped {len(QUADRATIC_ORACLES)} quadratic oracles)"
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
