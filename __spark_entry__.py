"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``economic_data_project_spark``; this module is
a thin adapter over its query registry.
"""

from __future__ import annotations

import ast
import glob
import json
import os
import subprocess
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from economic_data_project_spark import registry  # noqa: E402
from economic_data_project_spark.session import tune_session  # noqa: E402

_PKG = "economic_data_project_spark"


def _git(*args: str) -> str:
    try:
        res = subprocess.run(
            ["git", *args],
            cwd=_HERE,
            capture_output=True,
            text=True,
            timeout=15,
        )
        return res.stdout if res.returncode == 0 else ""
    except Exception:
        return ""


def _module_files(mod_name: str) -> set[str]:
    """Repo-relative file candidates for a dotted module name (plain
    module or package __init__)."""
    base = mod_name.replace(".", "/")
    return {base + ".py", base + "/__init__.py"}


def _deps_of(mod_name: str) -> set[str]:
    """``mod_name`` plus every package module its SOURCE imports — a
    static AST scan rather than runtime ``vars()`` introspection, so
    plain-data imports (string constants like ``functions/vectors.py``'s
    SQL fragments, lexicon dicts, …) register as dependencies too; those
    have no ``__module__`` and are invisible to a runtime scan."""
    deps = {mod_name}
    path = os.path.join(_HERE, mod_name.replace(".", "/") + ".py")
    try:
        with open(path) as fh:
            tree = ast.parse(fh.read())
    except (OSError, SyntaxError):
        return deps
    pkg_parts = mod_name.split(".")[:-1]
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(_PKG):
                    deps.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:
                base = pkg_parts[: len(pkg_parts) - (node.level - 1)]
                mod = ".".join(
                    base
                    + (node.module.split(".") if node.module else [])
                )
            else:
                mod = node.module or ""
            if mod.startswith(_PKG):
                deps.add(mod)
                for a in node.names:
                    # `from .functions import ta` imports a MODULE by
                    # name; non-module names resolve to no file and
                    # match nothing — harmless.
                    deps.add(f"{mod}.{a.name}")
    return deps


def _changed_queries() -> list[str]:
    """Queries whose Spark code or oracle changed since the last
    driver-recorded CORRECTNESS file — derived from ``git diff`` so the
    force-first list can never go stale (a hand-edited list silently
    skipped re-verification of changed code). A query counts as changed
    when its defining module, or any package module that module's source
    imports (e.g. ``functions/ta.py`` helpers shared by many oracles),
    differs from the tree at the commit that last touched the newest
    ``CORRECTNESS_r*.json``."""
    recs = sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")))
    if not recs:
        return []
    ref = _git(
        "log", "-n", "1", "--format=%H", "--", os.path.basename(recs[-1])
    ).strip()
    if not ref:
        return []
    changed = {
        f
        for f in _git("diff", "--name-only", ref).splitlines()
        if f.endswith(".py")
    }
    # registry.py is pure registration plumbing imported by every query
    # module; counting it as a semantic dependency would flag the whole
    # registry on any new-query addition and push genuinely-new queries
    # out of the driver's bounded verification prefix.
    changed.discard(f"{_PKG}/registry.py")
    if not changed:
        return []
    out: list[str] = []
    dep_cache: dict[str, set[str]] = {}
    for name, fn in registry.all_queries().items():
        mod = fn.__module__
        if mod not in dep_cache:
            files: set[str] = set()
            for d in _deps_of(mod):
                files |= _module_files(d)
            dep_cache[mod] = files
        if dep_cache[mod] & changed:
            out.append(name)
    return out


def _ever_passed() -> set[str]:
    """Names that passed all three driver checks in any prior round."""
    passed: set[str] = set()
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                passed.add(name)
    return passed


def _priority_order(names: list[str]) -> list[str]:
    """Never-driver-verified first, then changed-this-round, then the
    stable tail — so a driver that checks a bounded prefix always spends
    its budget on the queries with no green row yet before re-verifying
    changed-but-previously-green ones (a broad shared-helper edit can
    flag most of the registry; new queries must not be crowded out)."""
    force = set(_changed_queries())
    passed = _ever_passed()
    fresh = [n for n in names if n not in passed]
    changed = [n for n in names if n in passed and n in force]
    stable = [n for n in names if n in passed and n not in force]
    return fresh + changed + stable


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary report) on /root/testdata/sf0.001."""
    tune_session(spark)
    qs = registry.all_queries()
    return qs["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = registry.all_queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    order = _priority_order(list(base))
    return {name: _wrap(base[name]) for name in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted = rows-only)."""
    oracles = registry.all_oracles()
    order = _priority_order(list(registry.all_queries()))
    return {name: oracles[name] for name in order if name in oracles}
