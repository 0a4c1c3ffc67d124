"""normalize_ts parity with DuckDB's ns->us parquet conversion.

The events table ships TIMESTAMP(NANOS); Spark reads nanos-as-long and
normalize_ts converts to microseconds with integer `div 1000`, which
truncates TOWARD ZERO. DuckDB's parquet reader does the same (verified
on DuckDB 1.0.0: -1500 ns reads back as -1 us — floor semantics would
give -2), so truncation is the parity-correct choice even for pre-1970
timestamps. This test pins that: a floor-division "fix" would break the
negative-epoch rows below.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# nanos spanning the epoch: exact-us, sub-us positive, sub-us negative,
# and a just-before-epoch value where truncate (0) and floor (-1) differ.
_NANOS = [-1, -1500, -999_999_999, -2_000, 0, 1, 999, 1500, 1_000_000_001]


@pytest.mark.parametrize("nanos", [_NANOS])
def test_normalize_ts_matches_duckdb_on_negative_epochs(
    spark, tmp_path, nanos
):
    from pyspark.sql import functions as F

    from economic_data_project_spark.catalog import normalize_ts

    path = str(tmp_path / "ns.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(nanos, type=pa.timestamp("ns"))}), path
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sdf = normalize_ts(spark.read.parquet(path))
    s_us = [
        r[0]
        for r in sdf.select(
            F.unix_micros(F.col("ts")).alias("us")
        ).collect()
    ]

    con = duckdb.connect()
    d_us = [
        r[0]
        for r in con.execute(
            f"SELECT epoch_us(ts) FROM read_parquet('{path}')"
        ).fetchall()
    ]
    con.close()

    assert s_us == d_us
    # the truncate-vs-floor distinguishing rows, pinned explicitly
    by_ns = dict(zip(nanos, s_us))
    assert by_ns[-1] == 0  # floor would say -1
    assert by_ns[-1500] == -1  # floor would say -2
    assert by_ns[-999_999_999] == -999_999  # floor: -1_000_000


def test_schema_cache_reads_are_schema_identical(spark, tmp_path):
    """catalog._SCHEMA_CACHE: the cached-schema re-read of a table must
    produce the exact inferred schema (the cache exists to skip the
    footer-read inference JOB, never to change what is read), and the
    cache must be keyed by resolved path so two tables never share an
    entry. Uses a scratch dir via the catalog's own path scheme."""
    from pyspark.sql import functions as F

    from economic_data_project_spark import catalog

    sf_dir = str(tmp_path)
    spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.lit("t").alias("text"),
        F.lit(1.5).alias("score"),
    ).write.parquet(catalog.table_path(sf_dir, "documents"))
    spark.range(3).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(0.1), F.lit(0.2)).alias("embedding"),
    ).write.parquet(catalog.table_path(sf_dir, "embeddings"))

    first = catalog.load_table(spark, sf_dir, "documents")
    real = catalog.os.path.realpath(
        catalog.table_path(sf_dir, "documents")
    )
    mtime = catalog.os.stat(real).st_mtime_ns
    # first read cached under the current mtime
    assert catalog._SCHEMA_CACHE[real][0] == mtime
    second = catalog.load_table(spark, sf_dir, "documents")
    assert second.schema == first.schema
    assert [r["doc_id"] for r in second.orderBy("doc_id").collect()] == [
        0, 1, 2, 3, 4,
    ]
    emb = catalog.load_table(spark, sf_dir, "embeddings")
    assert emb.schema != first.schema  # no cross-table key collision
    assert emb.count() == 3


def test_schema_cache_invalidates_on_rewrite(spark, tmp_path):
    """A path REWRITTEN in-process with a different schema must be
    re-inferred — the mtime key component is the invalidation. Reading
    with the stale cached schema would silently drop the new column
    (review finding r11: load_table also serves generated corpora —
    longdoc lane, test fixtures — so 'catalog tables are immutable'
    does not hold for every caller)."""
    import time as _time

    from pyspark.sql import functions as F

    from economic_data_project_spark import catalog

    sf_dir = str(tmp_path)
    path = catalog.table_path(sf_dir, "documents")
    spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("text")
    ).write.parquet(path)
    v1 = catalog.load_table(spark, sf_dir, "documents")
    assert set(v1.columns) == {"doc_id", "text"}
    _time.sleep(0.01)  # ensure a distinct dir mtime
    spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.lit("b").alias("text"),
        F.lit("en").alias("lang"),
    ).write.mode("overwrite").parquet(path)
    v2 = catalog.load_table(spark, sf_dir, "documents")
    assert set(v2.columns) == {"doc_id", "text", "lang"}
    assert v2.where(F.col("lang") == "en").count() == 3
    # the rewrite EVICTED the stale entry rather than leaking one per
    # rewrite (ADVICE r11 #3): exactly one live schema per path
    real = catalog.os.path.realpath(path)
    assert set(catalog._SCHEMA_CACHE[real][1].fieldNames()) == {
        "doc_id", "text", "lang",
    }
