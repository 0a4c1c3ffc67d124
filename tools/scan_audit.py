"""Fact-table rescan audit: for every registered query, count parquet
scans per table in the cold physical plan and flag queries that re-scan
fact tables many times (the union-fan-out anti-pattern r9 fixed in
interesting_data_points / economic_alert_events /
series_latest_aggregates — free at sf0.1, N full IO passes at 100 TB).

Usage: python tools/scan_audit.py [min_fact_scans] [sf_dir]
(sf_dir also via $SPARK_GRAFT_SF_DIR; default /root/testdata/sf0.001)

Runs under caches.lazy_builds() so builders construct plans without
paying eager cache fills (the iterative builders — hierarchy,
connected components — still execute; their localCheckpoint truncation
is load-bearing). Mention counts are RENDERING counts (an
InMemoryRelation block renders its cached child's scans too) — read
them next to the IMR column: high mentions with imr=0 means real
rescans; high mentions with matching imr means the accesses go through
caches. tests/test_plans.py's _scans_outside_imr is the precise
per-line classifier.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from economic_data_project_spark.caches import (  # noqa: E402
    free_session_caches,
    lazy_builds,
)
from economic_data_project_spark.registry import all_queries  # noqa: E402
from economic_data_project_spark.session import get_spark  # noqa: E402

FACTS = {"lineitem", "orders", "events", "documents", "embeddings"}


def main() -> None:
    threshold = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
        )
    )
    spark = get_spark(app_name="scan-audit")
    rows = []
    with lazy_builds():
        for name, fn in sorted(all_queries().items()):
            try:
                free_session_caches()
                phys = (
                    fn(spark, sf_dir)
                    ._jdf.queryExecution()
                    .toString()
                    .split("== Physical Plan ==", 1)[1]
                )
            except Exception as e:  # noqa: BLE001
                print(f"ERR {name}: {type(e).__name__}", file=sys.stderr)
                continue
            tabs = Counter(
                re.findall(
                    r"Location: InMemoryFileIndex\(1 paths\)"
                    r"\[file:[^\]]*/(\w+)\.parquet",
                    phys,
                )
            )
            hot = {
                t: c for t, c in tabs.items() if t in FACTS and c >= threshold
            }
            if hot:
                rows.append(
                    (
                        max(hot.values()),
                        name,
                        hot,
                        phys.count("InMemoryRelation"),
                    )
                )
    rows.sort(reverse=True)
    for worst, name, hot, imr in rows:
        print(f"{worst:3}x  {name:40} imr={imr:3} {hot}")


if __name__ == "__main__":
    main()
