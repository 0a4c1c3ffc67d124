"""Oracle sweep at an arbitrary scale factor: run every declared query
against its DuckDB oracle (order-insensitive, column-name-sorted value
compare — the driver's contract) at a LARGER sf than the driver's
sf0.01, catching scale-dependent divergence (aggregation-order float
drift, overflow, partition-count-sensitive results).

Usage: python tools/oracle_sweep.py [sf_dir]
       python tools/oracle_sweep.py --quadratic [n_docs] [src_sf_dir]

Default mode: every query EXCEPT those whose DECLARED ORACLE is
brute-force quadratic in DuckDB (all-pairs shingle/embedding
intersections — hours at 5000 docs); the exclusion is about oracle
cost, not engine doubt. r11 result at sf0.1: 143 MATCH + 7 rows-only,
0 FAIL in 510s (tools/bench_snapshots/r11_sf01_oracle_sweep.log).

--quadratic mode covers exactly that excluded family at the largest
scale its oracles can afford: a deterministic doc_id < n_docs
(default 1500) subsample of sf0.1 written to a scratch dir, 3x the
driver's 500-doc correctness scale. r11 result: 8/8 MATCH in 783s
(tools/bench_snapshots/r11_quadratic_1500docs.log).
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


def _subsample(n_docs: int, src: str) -> str:
    """Write a deterministic doc_id/vec_id < n_docs subset of ``src``'s
    documents+embeddings to a scratch dir (the only tables the
    quadratic family reads)."""
    import tempfile

    import duckdb

    out = tempfile.mkdtemp(prefix=f"oracle_sub{n_docs}_")
    con = duckdb.connect()
    for table, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')"
            f" WHERE {key} < {n_docs})"
            f" TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
    return out


def main_quadratic() -> None:
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    sf = _subsample(n_docs, src)
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from economic_data_project_spark.session import get_spark
    from tests.conftest import compare_with_oracle, duckdb_connect

    spark = get_spark(app_name="oracle-sweep-quadratic")
    queries, oracles = mod.queries(), mod.oracle_sql()
    con = duckdb_connect(sf)
    fails = 0
    t00 = time.time()
    for name in sorted(QUADRATIC_ORACLES):
        t0 = time.time()
        try:
            ok, msg = compare_with_oracle(
                spark, queries[name], oracles[name], sf, con=con.cursor()
            )
        except Exception as e:  # noqa: BLE001 — sweep must finish
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        fails += not ok
        print(
            f"{'MATCH' if ok else 'FAIL':5} {name}: {msg}"
            f" ({time.time() - t0:.0f}s)",
            flush=True,
        )
    print(
        f"TOTAL quadratic-oracle family at {n_docs} docs:"
        f" {len(QUADRATIC_ORACLES) - fails}/{len(QUADRATIC_ORACLES)}"
        f" MATCH in {time.time() - t00:.0f}s"
    )
    sys.exit(1 if fails else 0)


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
    if len(sys.argv) > 1 and sys.argv[1] == "--quadratic":
        main_quadratic()
    else:
        main()
