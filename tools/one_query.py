import importlib.util, math, sys, decimal
import duckdb
from pyspark.sql import SparkSession

NAMES = sys.argv[1:]
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .appName("one-query").getOrCreate())

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal): return repr(float(v))
    return str(v)

qs, os_ = mod.queries(), mod.oracle_sql()
for name in NAMES:
    sdf = qs[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in os_:
        print(f"{name}: rows-only ({len(srows)} rows)"); continue
    res = con.execute(os_[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    cols_ok = sorted(scols) == sorted(dcols)
    sset = sorted("|".join(norm(r[i]) for i in order_s) for r in srows)
    dset = sorted("|".join(norm(r[i]) for i in order_d) for r in drows)
    ok = len(srows)==len(drows) and cols_ok and sset==dset
    print(f"{name}: rows {len(srows)}/{len(drows)} cols_ok={cols_ok} MATCH={ok}")
    if not ok:
        if not cols_ok:
            print("  spark cols:", sorted(scols)); print("  duck cols:", sorted(dcols))
        for a,b in zip(sset, dset):
            if a!=b:
                print("  S:", a[:300]); print("  D:", b[:300]); break
