"""r15 probe: does spreading the single-task lineitem scan before the
daily OHLCV aggregate pay? Interleaved same-process A/B, noop sink.

Usage: python tools/probe_li_spread.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from economic_data_project_spark.catalog import load_table, spread_scan  # noqa: E402
from economic_data_project_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEC = "decimal(28,6)"


def daily(li):
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.to_date("l_shipdate").alias("d"),
    ).agg(
        (F.sum(rev.cast(DEC)).cast("double") / F.lit(1e6)).alias("close"),
        (F.max("l_extendedprice") / F.lit(1e4)).alias("high"),
        (F.min("l_extendedprice") / F.lit(1e4)).alias("low"),
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.lit(1e3)).alias(
            "volume"
        ),
    )


def run(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="probe-li-spread")
    li = load_table(spark, SF, "lineitem")
    plain = daily(li)
    spread = daily(spread_scan(li, "l_orderkey"))
    # warm JVM
    plain.limit(1).collect()
    a, b = [], []
    for _ in range(reps):
        a.append(run(plain))
        b.append(run(spread))
    print(f"plain : median={statistics.median(a):.3f} runs={[round(x,3) for x in a]}")
    print(f"spread: median={statistics.median(b):.3f} runs={[round(x,3) for x in b]}")
    print(f"scan partitions: {li.rdd.getNumPartitions()}")


if __name__ == "__main__":
    main()
