"""DAG executor tests: topological ordering, cycle detection,
materialization policies (view vs table vs incremental)."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from economic_data_project_spark.plans.dag import ModelGraph
from economic_data_project_spark.sources.warehouse import Warehouse


def test_topo_order_and_unknown_dep(spark):
    g = ModelGraph()

    @g.model("a")
    def a(s):
        return s.range(3).select(F.col("id").alias("x"))

    @g.model("b", deps=("a",))
    def b(s):
        return s.table("a").where("x > 0")

    @g.model("c", deps=("b", "a"))
    def c(s):
        return s.table("b").join(s.table("a"), "x")

    order = g.topo_order(["c"])
    assert order.index("a") < order.index("b") < order.index("c")

    with pytest.raises(ValueError):

        @g.model("d", deps=("nope",))
        def d(s):
            return s.range(1)


def test_run_view_chain(spark):
    g = ModelGraph()

    @g.model("base")
    def base(s):
        return s.range(10).select(F.col("id"), (F.col("id") * 2).alias("y"))

    @g.model("filtered", deps=("base",))
    def filtered(s):
        return s.table("base").where("y >= 10")

    out = g.run(spark, targets=["filtered"])
    assert out["filtered"].count() == 5


def test_run_table_and_incremental(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    g = ModelGraph()

    @g.model("snap", materialization="table")
    def snap(s):
        return s.createDataFrame(
            [(1, date(2020, 1, 1), 1.0)], ["id", "d", "v"]
        )

    @g.model(
        "inc",
        deps=("snap",),
        materialization="incremental",
        key_columns=("id",),
        watermark_column="d",
    )
    def inc(s):
        return s.table("snap")

    g.run(spark, warehouse=wh)
    assert wh.table("inc").count() == 1

    # second run with a newer row lands incrementally
    @ModelGraph().model("noop")
    def _noop(s):
        return s.range(1)

    g.models["snap"].build = lambda s: s.createDataFrame(
        [(1, date(2020, 1, 1), 1.0), (2, date(2020, 2, 1), 2.0)],
        ["id", "d", "v"],
    )
    g.run(spark, warehouse=wh)
    rows = {r.id: r.v for r in wh.table("inc").collect()}
    assert rows == {1: 1.0, 2: 2.0}
