"""Semantic layer planner tests (resolution errors, ratio/derived
metric expression trees, cross-model planning)."""

from __future__ import annotations

import pytest

from economic_data_project_spark.semantic.marts import LAYER


def test_unknown_metric_and_missing_dimension_errors():
    with pytest.raises(KeyError, match="unknown metric"):
        LAYER.to_sql(metrics=["nope"], group_by=["month"])
    with pytest.raises(KeyError, match="not declared"):
        # order_status exists only on order_facts; revenue lives on
        # shipment_facts -> cross-model join impossible on that dim
        LAYER.to_sql(
            metrics=["revenue"], group_by=["order_status"]
        )


def test_plan_splits_measures_by_owning_model():
    plan = LAYER._plan(
        ["revenue", "orders", "revenue_per_order"], ["month"]
    )
    assert set(plan) == {"order_facts", "shipment_facts"}
    assert "order_count" in plan["order_facts"]
    assert "ship_revenue" in plan["shipment_facts"]


def test_derived_metric_expands_recursively():
    exprs = LAYER._post_agg(["revenue_per_order"])
    e = exprs["revenue_per_order"]
    assert "ship_revenue" in e and "order_count" in e
    assert "revenue_per_order" not in e  # fully expanded


def test_ratio_metric_guards_zero_denominator():
    e = LAYER._post_agg(["avg_order_value"])["avg_order_value"]
    assert "NULLIF(order_count, 0)" in e


def test_fill_nulls_with_wraps_expression():
    e = LAYER._post_agg(["quantity"])["quantity"]
    assert e.startswith("COALESCE(") and e.endswith(", 0.0)")


def test_to_sql_cross_model_joins_on_shared_dimension():
    sql = LAYER.to_sql(
        metrics=["revenue", "orders"], group_by=["month"]
    )
    assert "FULL OUTER JOIN" in sql
    assert "IS NOT DISTINCT FROM" in sql
    assert "date_trunc('month'" in sql
