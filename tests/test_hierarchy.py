"""Pointer-doubling hierarchy resolution: forests, not just chains."""

from __future__ import annotations

from economic_data_project_spark.operators.hierarchy import (
    resolve_hierarchy,
)


def test_resolve_hierarchy_forest(spark):
    #        1            7
    #       / \           |
    #      2   3          8
    #     /|    \
    #    4 5     6
    rows = [
        (1, None, 100),
        (2, 1, 100),
        (3, 1, 100),
        (4, 2, 100),
        (5, 2, 100),
        (6, 3, 100),
        (7, None, 200),
        (8, 7, 200),
        (9, None, 300),  # isolated root
    ]
    linked = spark.createDataFrame(
        rows, "event_id bigint, parent_id bigint, user_id bigint"
    )
    out = {
        r.event_id: (r.root_id, r.depth)
        for r in resolve_hierarchy(linked).collect()
    }
    assert out == {
        1: (1, 0),
        2: (1, 1),
        3: (1, 1),
        4: (1, 2),
        5: (1, 2),
        6: (1, 2),
        7: (7, 0),
        8: (7, 1),
        9: (9, 0),
    }


def test_resolve_hierarchy_deep_chain(spark):
    """Chain longer than one doubling round still converges (log2 rounds)."""
    n = 9
    rows = [(i, i - 1 if i > 1 else None, 1) for i in range(1, n + 1)]
    linked = spark.createDataFrame(
        rows, "event_id bigint, parent_id bigint, user_id bigint"
    )
    out = {
        r.event_id: (r.root_id, r.depth)
        for r in resolve_hierarchy(linked).collect()
    }
    assert out == {i: (1, i - 1) for i in range(1, n + 1)}
