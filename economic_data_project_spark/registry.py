"""Query registry: the declared-operator surface of the engine.

Each implemented operator from SURVEY.md §2 is registered here as a named
query ``(spark, sf_dir) -> DataFrame`` plus, where SQL-expressible, an
equivalent ANSI-SQL oracle string that DuckDB runs over the same parquet
tables. This mirrors the reference's own test strategy: Python operator
logic validated against real SQL execution on DuckDB
(macro_agents/tests/conftest.py:144-220).

Column-name contract: every computed column is aliased identically in the
Spark query and the oracle SQL (the driver sorts columns by name before
hashing values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run."""
    from .operators import (  # noqa: F401
        advanced,
        aggregates,
        corr_enhanced,
        data_points,
        econ_series,
        event_study,
        events,
        hierarchy,
        housing,
        indicators,
        leading_indicator,
        market_analysis,
        joins,
        recursive,
        regime_perf,
        relational,
        setops,
        windows,
    )
    from .plans import (  # noqa: F401
        family_spine,
        models,
        sensitivity_chain,
        signal_chain,
    )
    from .multimodal import media  # noqa: F401
    from .quality import checks, coverage, profiling, schema_tests  # noqa: F401
    from .semantic import marts  # noqa: F401
    from .signals import (  # noqa: F401
        acceleration,
        alerts,
        breadth,
        divergences,
        kernels,
        liquidity,
        momentum,
        volatility,
    )
    from .similarity import ann, quant, semdedup  # noqa: F401
    from .sources import bucketed  # noqa: F401
    from .sources import files  # noqa: F401
    from .streaming import dedup as stream_dedup  # noqa: F401
    from .streaming import ingest  # noqa: F401
    from .streaming import neardup as stream_neardup  # noqa: F401
    from .text import (  # noqa: F401
        analysis,
        cdc,
        classifier,
        dedup,
        documents,
        dsir,
        extraction,
        lm_quality,
        mentions,
        ml,
        sampling,
        screening,
        selection,
        vocab,
        trends,
    )


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
