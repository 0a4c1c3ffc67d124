"""Driver simulation: load __spark_entry__.py fresh BY FILE PATH (as the
driver does), smoke entry(), then run every queries()[name] at sf0.01 and
compare against oracle_sql()[name] on DuckDB (order-insensitive,
column-name-sorted value compare). Thread-parallel like the pytest sweep."""

import importlib.util
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

SF = "/root/testdata/sf0.01"

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

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
sys.exit(1 if n_fail else 0)
