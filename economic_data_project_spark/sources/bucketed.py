"""Bucketed tables: pre-shuffled storage for co-located joins.

The 100 TB join story the mandate names explicitly: a fact-fact join
(orders x lineitem on orderkey) shuffles BOTH sides on every query.
Bucketing pays that shuffle ONCE at write time — `bucketBy(n, key)`
hash-partitions rows into n files per partition by the join key and
records the layout in the catalog — after which every join (and
aggregation) on that key reads co-located buckets with NO Exchange:
SortMergeJoin consumes the bucketed scans directly. At 100 TB this is
the difference between re-shuffling the fact table per query and
never shuffling it again.

Spark specifics this module encodes:
- `bucketBy` requires `saveAsTable` (the layout lives in catalog
  metadata, not the files); `.option("path", ...)` keeps the data in
  an external location instead of polluting spark.sql.warehouse.dir.
- Both join sides must agree on bucket count and key for the
  exchange-free plan; `sortBy` inside buckets lets the merge join
  skip its sorts too when Spark can prove per-bucket order.
- Small driver/test tables would broadcast (BHJ) and hide the layout
  entirely, so the co-located join forces the merge strategy with a
  plan-local `hint("merge")` rather than mutating session config.

Reference counterpart: the warehouse clustering keys the reference
sets on its biggest BigQuery tables
(dbt_project/dbt_project.yml cluster_by config) — same intent,
engine-appropriate mechanism.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_N_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = _N_BUCKETS,
) -> None:
    """Persist ``df`` as an external bucketed+sorted table at ``path``
    (drop-and-replace: deterministic double-invocation)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


_BUCKETED_ORACLE = """
SELECT o.o_orderpriority AS priority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
ORDER BY priority
"""


@query("bucketed_colocated_join", oracle=_BUCKETED_ORACLE)
def bucketed_colocated_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fact-fact join over tables bucketed on the join key: the
    per-query shuffle of both sides is eliminated (paid once at write
    time). The plan gate (tests/test_plans.py) asserts NO Exchange
    below the SortMergeJoin — only the post-join aggregation and the
    display sort may exchange. The merge hint is what makes the
    driver-scale demo honest: at sf0.01 both sides fit the broadcast
    threshold and a BHJ would bypass the bucketed layout entirely,
    while at 100 TB the merge join is what the planner picks anyway."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_bucketed_{tag}"
    )
    names = {}
    for t, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        names[t] = f"spark_graft_bkt_{t}_{tag}"
        write_bucketed(
            load_table(spark, sf_dir, t),
            names[t],
            os.path.join(base, t),
            key,
        )
    o = spark.table(names["orders"]).select(
        "o_orderkey", "o_orderpriority"
    )
    li = spark.table(names["lineitem"]).select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev"
        ),
    )
    joined = o.join(
        li.hint("merge"), o.o_orderkey == li.l_orderkey
    )
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("rev").cast("decimal(28,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("priority")
    )
