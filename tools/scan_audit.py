"""Fact-table rescan audit: for every registered query, count parquet
scans per table in the cold physical plan and flag queries that re-scan
fact tables many times (the union-fan-out anti-pattern r9 fixed in
interesting_data_points / economic_alert_events /
series_latest_aggregates — free at sf0.1, N full IO passes at 100 TB).

Usage: python tools/scan_audit.py [min_fact_scans]
Mention counts are RENDERING counts (an InMemoryRelation block renders
its cached child's scans too) — read them next to the IMR column: high
mentions with imr=0 means real rescans; high mentions with matching imr
means the accesses go through caches. tests/test_plans.py's
_scans_outside_imr is the precise per-line classifier.
"""

from __future__ import annotations

import re
import sys
from collections import Counter

sys.path.insert(0, ".")

from economic_data_project_spark.caches import free_session_caches  # noqa: E402
from economic_data_project_spark.registry import all_queries  # noqa: E402
from economic_data_project_spark.session import get_spark  # noqa: E402

FACTS = {"lineitem", "orders", "events", "documents", "embeddings"}
SF = "/root/testdata/sf0.001"


def main() -> None:
    threshold = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="scan-audit")
    rows = []
    for name, fn in sorted(all_queries().items()):
        try:
            free_session_caches()
            phys = (
                fn(spark, SF)
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
        hot = {t: c for t, c in tabs.items() if t in FACTS and c >= threshold}
        if hot:
            rows.append(
                (max(hot.values()), name, hot, phys.count("InMemoryRelation"))
            )
    rows.sort(reverse=True)
    for worst, name, hot, imr in rows:
        print(f"{worst:3}x  {name:40} imr={imr:3} {hot}")


if __name__ == "__main__":
    main()
