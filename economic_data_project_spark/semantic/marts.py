"""Concrete semantic models + metric registry over the warehouse marts,
and the oracle-checked semantic queries.

Reference parity: models/metrics.yml:1-87 (simple + ratio metrics over
measures), semantic_layer/semantic_models.yml:1-48 (entities, time
dimension with granularity, categorical dimensions, typed-agg measures).
Two semantic models over two different fact tables, so cross-model
metric queries exercise the shared-dimension join path.

Every semantic query's oracle is rendered by ``SemanticLayer.to_sql`` —
the layer's own second renderer — and validated by DuckDB, so the
planner's resolution logic is value-checked across engines, not just
unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import query
from .layer import (
    Dimension,
    Entity,
    Measure,
    Metric,
    SemanticLayer,
    SemanticModel,
)

LAYER = SemanticLayer()

LAYER.add_model(
    SemanticModel(
        name="order_facts",
        table="orders",
        entities=[
            Entity("order", "primary", "o_orderkey"),
            Entity("customer", "foreign", "o_custkey"),
        ],
        dimensions=[
            Dimension("month", "time", "o_orderdate", grain="month"),
            Dimension("order_status", "categorical", "o_orderstatus"),
        ],
        measures=[
            Measure("order_total", "sum", "o_totalprice"),
            Measure("order_count", "count", "o_orderkey"),
            Measure("ordering_customers", "count_distinct", "o_custkey"),
            Measure("max_order_value", "max", "o_totalprice"),
        ],
    )
)

LAYER.add_model(
    SemanticModel(
        name="shipment_facts",
        table="lineitem",
        entities=[
            Entity("order", "foreign", "l_orderkey"),
            Entity("supplier", "foreign", "l_suppkey"),
        ],
        dimensions=[
            Dimension("month", "time", "l_shipdate", grain="month"),
            Dimension("return_flag", "categorical", "l_returnflag"),
        ],
        measures=[
            Measure(
                "ship_revenue", "sum", "l_extendedprice * (1 - l_discount)"
            ),
            Measure("shipped_qty", "sum", "l_quantity"),
            Measure("line_count", "count", "l_orderkey"),
            Measure("shipping_suppliers", "count_distinct", "l_suppkey"),
        ],
    )
)

for m in [
    Metric("total_order_value", "simple", measure="order_total"),
    Metric("orders", "simple", measure="order_count"),
    Metric("customers", "simple", measure="ordering_customers"),
    Metric("max_order", "simple", measure="max_order_value"),
    Metric(
        "avg_order_value",
        "ratio",
        numerator="order_total",
        denominator="order_count",
    ),
    Metric("revenue", "simple", measure="ship_revenue"),
    Metric("quantity", "simple", measure="shipped_qty", fill_nulls_with=0.0),
    Metric("suppliers", "simple", measure="shipping_suppliers"),
    Metric(
        "revenue_per_order",
        "derived",
        expr="revenue / NULLIF(orders, 0)",
        inputs=("revenue", "orders"),
    ),
]:
    LAYER.add_metric(m)


def _tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {
        t: load_table(spark, sf_dir, t) for t in ("orders", "lineitem")
    }


_MONTHLY_ARGS = dict(
    metrics=["total_order_value", "orders", "customers", "avg_order_value"],
    group_by=["month"],
)


@query(
    "semantic_monthly_orders",
    oracle=LAYER.to_sql(**_MONTHLY_ARGS),
)
def semantic_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-model metric query at month grain (simple + ratio)."""
    return LAYER.query(spark, _tables(spark, sf_dir), **_MONTHLY_ARGS)


_CROSS_ARGS = dict(
    metrics=["revenue", "orders", "quantity", "revenue_per_order"],
    group_by=["month"],
)


@query(
    "semantic_cross_model_month",
    oracle=LAYER.to_sql(**_CROSS_ARGS),
)
def semantic_cross_model_month(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-model metric query: measures from two fact tables joined on
    the shared month dimension; a derived metric spans both models."""
    return LAYER.query(spark, _tables(spark, sf_dir), **_CROSS_ARGS)


_FILTERED_ARGS = dict(
    metrics=["total_order_value", "avg_order_value", "max_order"],
    group_by=["order_status"],
    where="o_totalprice > 50000",
)


@query(
    "semantic_status_filtered",
    oracle=LAYER.to_sql(**_FILTERED_ARGS),
)
def semantic_status_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical grain with a dimension filter applied pre-aggregation
    (pushed to the scan on the Spark side)."""
    return LAYER.query(spark, _tables(spark, sf_dir), **_FILTERED_ARGS)
