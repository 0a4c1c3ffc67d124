"""Plan-audit helpers: which fact tables does a query's COLD plan read
directly (outside every cache)?

The only reliable classifier is a WALK of the optimized logical plan
(cache substitution has already run there; ``InMemoryRelation`` is a
leaf whose cached child is not among ``children()``). The string
rendering is unusable for counting at this repo's plan sizes: it
DUPLICATES shared DAG nodes (one shingle subtree re-rendered 24x in
the training-manifest plan — same ``plan_id`` every time), and
executed-AQE cached children print ``== Final Plan ==`` sections that
reset indentation, which breaks any line/indent-based IMR scoping.

Used by tests/test_plans.py's registry-wide scan gate and
tools/scan_audit.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fact_scans_outside_imr(df: DataFrame, fact: str) -> list[str]:
    """Relation leaves reading ``<fact>.parquet`` that are NOT inside
    any InMemoryRelation, as ``simpleString`` excerpts. Walks the
    optimized plan and every subquery plan; stops at IMR boundaries
    (reads under a cache are served by its one fill)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    out: list[str] = []

    def leaf_hits(node) -> None:
        try:
            paths = node.relation().location().rootPaths()
        except Exception:
            return
        it = paths.iterator()
        while it.hasNext():
            if it.next().toString().endswith(f"/{fact}.parquet"):
                out.append(node.simpleString(160))

    def walk(node) -> None:
        if node.getClass().getSimpleName() == "InMemoryRelation":
            return
        it = node.children().iterator()
        has_child = False
        while it.hasNext():
            has_child = True
            walk(it.next())
        if not has_child:
            leaf_hits(node)

    walk(plan)
    sub = plan.subqueriesAll().iterator()
    while sub.hasNext():
        walk(sub.next())
    return out
