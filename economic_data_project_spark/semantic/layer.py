"""Semantic layer: metric / measure / entity / dimension registry with a
MetricFlow-style query planner.

Mirrors the reference's dbt semantic layer (models/metrics.yml:1-87
simple+ratio metric registry; semantic_layer/semantic_models.yml:1-48
semantic models with entities, categorical + time dimensions with
granularity, and typed-agg measures). One declaration renders BOTH the
Spark plan and the equivalent DuckDB SQL, so every semantic query is
oracle-checkable end-to-end.

Resolution pipeline (the MetricFlow core):
1. metrics -> owning measures -> owning semantic models
2. per model: groupBy(resolved dimension exprs).agg(typed measures)
3. cross-model metric queries full-outer join the per-model grains on
   the shared group-by keys with coalesced columns (how MetricFlow
   joins semantic models through shared dimensions)
4. ratio / derived metrics apply post-aggregation expression trees
   (NULLIF-guarded), then fill_nulls_with defaults

Determinism: sum/avg measures go through the decimal-exact parity
helpers (functions/parity.py) so Spark results hash-match DuckDB at any
parallelism.

Scale: each semantic query is one hash aggregate per touched model plus
(for cross-model queries) a join on the already-aggregated grain —
thousands of rows, broadcastable; the fact tables never join each other.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import dsum, sql_davg, sql_dsum


# ---------------------------------------------------------------- schema


@dataclass(frozen=True)
class Measure:
    name: str
    agg: str  # sum | avg | count | count_distinct | min | max
    expr: str  # dialect-neutral SQL over the model's columns

    def spark(self) -> Column:
        e = F.expr(self.expr)
        if self.agg == "sum":
            return dsum(e)
        if self.agg == "avg":
            return dsum(e) / F.count(e)
        if self.agg == "count":
            return F.count(e)
        if self.agg == "count_distinct":
            return F.countDistinct(e)
        if self.agg == "min":
            return F.min(e)
        if self.agg == "max":
            return F.max(e)
        raise ValueError(f"unknown agg {self.agg!r}")

    def sql(self) -> str:
        if self.agg == "sum":
            return sql_dsum(self.expr)
        if self.agg == "avg":
            return sql_davg(self.expr)
        if self.agg == "count":
            return f"COUNT({self.expr})"
        if self.agg == "count_distinct":
            return f"COUNT(DISTINCT {self.expr})"
        return f"{self.agg.upper()}({self.expr})"


@dataclass(frozen=True)
class Dimension:
    name: str
    type: str = "categorical"  # categorical | time
    expr: str | None = None  # defaults to name
    grain: str = "month"  # for time dims: day | month | quarter | year

    def _base(self) -> str:
        return self.expr or self.name

    def spark(self) -> Column:
        if self.type == "time":
            d = F.to_date(F.expr(self._base()))
            if self.grain == "day":
                return d.alias(self.name)
            return F.trunc(d, self.grain).alias(self.name)
        return F.expr(self._base()).alias(self.name)

    def sql(self) -> str:
        if self.type == "time":
            d = f"CAST({self._base()} AS DATE)"
            if self.grain == "day":
                return f"{d} AS {self.name}"
            return f"date_trunc('{self.grain}', {d}) AS {self.name}"
        return f"{self._base()} AS {self.name}"


@dataclass(frozen=True)
class Entity:
    name: str
    type: str = "primary"  # primary | foreign
    expr: str | None = None


@dataclass
class SemanticModel:
    name: str
    table: str  # registered source table name
    entities: list[Entity] = field(default_factory=list)
    dimensions: list[Dimension] = field(default_factory=list)
    measures: list[Measure] = field(default_factory=list)

    def dimension(self, name: str) -> Dimension | None:
        return next((d for d in self.dimensions if d.name == name), None)

    def measure(self, name: str) -> Measure | None:
        return next((m for m in self.measures if m.name == name), None)


@dataclass(frozen=True)
class Metric:
    name: str
    type: str = "simple"  # simple | ratio | derived
    measure: str | None = None  # simple
    numerator: str | None = None  # ratio
    denominator: str | None = None  # ratio
    expr: str | None = None  # derived: SQL over other METRIC names
    inputs: tuple[str, ...] = ()  # derived: metric dependencies
    fill_nulls_with: float | None = None


# --------------------------------------------------------------- planner


class SemanticLayer:
    def __init__(self) -> None:
        self.models: dict[str, SemanticModel] = {}
        self.metrics: dict[str, Metric] = {}

    def add_model(self, model: SemanticModel) -> None:
        self.models[model.name] = model

    def add_metric(self, metric: Metric) -> None:
        self.metrics[metric.name] = metric

    # resolution ----------------------------------------------------------

    def _measure_owner(self, measure: str) -> SemanticModel:
        owners = [m for m in self.models.values() if m.measure(measure)]
        if len(owners) != 1:
            raise KeyError(
                f"measure {measure!r} owned by {[m.name for m in owners]}"
            )
        return owners[0]

    def _required_measures(self, metric_names: list[str]) -> list[str]:
        out: list[str] = []

        def visit(name: str) -> None:
            m = self.metrics.get(name)
            if m is None:
                raise KeyError(f"unknown metric {name!r}")
            if m.type == "simple":
                out.append(m.measure)
            elif m.type == "ratio":
                out.extend([m.numerator, m.denominator])
            elif m.type == "derived":
                for dep in m.inputs:
                    visit(dep)
            else:
                raise ValueError(f"unknown metric type {m.type!r}")

        for n in metric_names:
            visit(n)
        return list(dict.fromkeys(out))

    def _plan(
        self, metric_names: list[str], group_by: list[str]
    ) -> dict[str, list[str]]:
        """model name -> measures needed from it."""
        plan: dict[str, list[str]] = {}
        for ms in self._required_measures(metric_names):
            owner = self._measure_owner(ms)
            plan.setdefault(owner.name, []).append(ms)
        for model_name in plan:
            model = self.models[model_name]
            for g in group_by:
                if model.dimension(g) is None:
                    raise KeyError(
                        f"dimension {g!r} not declared on model"
                        f" {model_name!r} (cross-model queries join on"
                        " shared dimensions)"
                    )
        return plan

    def _metric_expr(self, name: str, cache: dict[str, str]) -> str:
        if name in cache:
            return cache[name]
        m = self.metrics[name]
        if m.type == "simple":
            e = m.measure
        elif m.type == "ratio":
            e = f"({m.numerator} / NULLIF({m.denominator}, 0))"
        else:  # derived over other metrics (recursive, boundary-safe)
            import re as _re

            e = m.expr
            for dep in m.inputs:
                dep_e = self._metric_expr(dep, cache)
                e = _re.sub(rf"\b{_re.escape(dep)}\b", f"({dep_e})", e)
        if m.fill_nulls_with is not None:
            e = f"COALESCE({e}, {m.fill_nulls_with})"
        cache[name] = e
        return e

    def _post_agg(self, metric_names: list[str]) -> dict[str, str]:
        """metric -> SQL expression over measure columns (shared by both
        renderers; column names are identical on both sides)."""
        cache: dict[str, str] = {}
        return {n: self._metric_expr(n, cache) for n in metric_names}

    # Spark rendering ------------------------------------------------------

    def query(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame],
        metrics: list[str],
        group_by: list[str],
        where: str | None = None,
    ) -> DataFrame:
        plan = self._plan(metrics, group_by)
        partials: list[DataFrame] = []
        for model_name, measure_names in plan.items():
            model = self.models[model_name]
            df = tables[model.table]
            if where:
                df = df.where(F.expr(where))
            dims = [model.dimension(g).spark() for g in group_by]
            aggs = [
                model.measure(ms).spark().alias(ms) for ms in measure_names
            ]
            partials.append(df.groupBy(*dims).agg(*aggs))

        joined = partials[0]
        for nxt in partials[1:]:
            a, b = joined.alias("a"), nxt.alias("b")
            cond = None
            for g in group_by:
                eq = F.col(f"a.{g}").eqNullSafe(F.col(f"b.{g}"))
                cond = eq if cond is None else (cond & eq)
            keep = [c for c in joined.columns if c not in group_by]
            joined = a.join(b, cond, "full_outer").select(
                *[
                    F.coalesce(F.col(f"a.{g}"), F.col(f"b.{g}")).alias(g)
                    for g in group_by
                ],
                *[F.col(f"a.{c}") for c in keep],
                *[
                    F.col(f"b.{c}")
                    for c in nxt.columns
                    if c not in group_by
                ],
            )

        post = self._post_agg(metrics)
        return joined.select(
            *group_by,
            *[F.expr(e).alias(name) for name, e in post.items()],
        ).orderBy(*group_by)

    # SQL rendering (the DuckDB oracle) ------------------------------------

    def to_sql(
        self,
        metrics: list[str],
        group_by: list[str],
        where: str | None = None,
    ) -> str:
        plan = self._plan(metrics, group_by)
        ctes = []
        for model_name, measure_names in plan.items():
            model = self.models[model_name]
            dims = ",\n    ".join(
                model.dimension(g).sql() for g in group_by
            )
            aggs = ",\n    ".join(
                f"{model.measure(ms).sql()} AS {ms}"
                for ms in measure_names
            )
            w = f"\n  WHERE {where}" if where else ""
            ctes.append(
                f"m_{model_name} AS (\n  SELECT\n    {dims},\n    {aggs}"
                f"\n  FROM {model.table}{w}\n  GROUP BY "
                + ", ".join(str(i + 1) for i in range(len(group_by)))
                + "\n)"
            )
        model_names = list(plan)
        base = f"m_{model_names[0]}"
        joins, key_exprs = base, {
            g: f"{base}.{g}" for g in group_by
        }
        for mn in model_names[1:]:
            nxt = f"m_{mn}"
            on = " AND ".join(
                f"({key_exprs[g]}) IS NOT DISTINCT FROM {nxt}.{g}"
                for g in group_by
            )
            joins += f"\n  FULL OUTER JOIN {nxt} ON {on}"
            for g in group_by:
                key_exprs[g] = f"COALESCE({key_exprs[g]}, {nxt}.{g})"
        keys = ",\n  ".join(
            f"({key_exprs[g]}) AS {g}" for g in group_by
        )
        post = self._post_agg(metrics)
        outs = ",\n  ".join(f"{e} AS {name}" for name, e in post.items())
        return (
            "WITH "
            + ",\n".join(ctes)
            + f"\nSELECT\n  {keys},\n  {outs}\nFROM {joins}\nORDER BY "
            + ", ".join(group_by)
        )
