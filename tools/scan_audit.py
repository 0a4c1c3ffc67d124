"""Audit every registered query's COLD plan for fact tables read
multiple times outside caches (the union-fan-out anti-pattern r9 fixed
in interesting_data_points / economic_alert_events /
series_latest_aggregates — free at sf0.1, N full IO passes at 100 TB).

Usage: python tools/scan_audit.py [min_fact_scans] [sf_dir]
(sf_dir also via $SPARK_GRAFT_SF_DIR; default /root/testdata/sf0.001)

Counts come from the optimized-plan TREE WALK
(economic_data_project_spark.plans.audit.fact_scans_outside_imr) —
NOT the rendered plan string, which both duplicates shared DAG nodes
(one shingle subtree re-rendered 24x in the manifest plan) and breaks
indent scoping inside executed-AQE cached children. Reads under an
InMemoryRelation are excluded: they're served by the cache's one fill.

Runs under caches.lazy_builds() so builders construct plans without
paying eager cache fills (the iterative builders — hierarchy,
connected components — still execute; their localCheckpoint truncation
is load-bearing). The registry-wide GATE form of this audit is
tests/test_plans.py::test_registry_fact_scans_outside_caches.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from economic_data_project_spark.caches import (  # noqa: E402
    free_session_caches,
    lazy_builds,
)
from economic_data_project_spark.plans.audit import (  # noqa: E402
    fact_scans_outside_imr,
)
from economic_data_project_spark.registry import all_queries  # noqa: E402
from economic_data_project_spark.session import get_spark  # noqa: E402

FACTS = ("lineitem", "orders", "events", "documents", "embeddings")


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
                df = fn(spark, sf_dir)
                hot = {
                    f: n
                    for f in FACTS
                    if (n := len(fact_scans_outside_imr(df, f)))
                    >= threshold
                }
            except Exception as e:  # noqa: BLE001
                print(f"ERR {name}: {type(e).__name__}", file=sys.stderr)
                continue
            if hot:
                rows.append((max(hot.values()), name, hot))
    rows.sort(reverse=True)
    for worst, name, hot in rows:
        print(f"{worst:3}x  {name:40} {hot}")
    if not rows:
        print(f"clean: no query reads a fact table >= {threshold}x"
              " outside caches")


if __name__ == "__main__":
    main()
