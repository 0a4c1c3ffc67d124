"""Warehouse API: the programmatic query/write surface of the engine.

Re-implements the reference's warehouse resource contract on Spark:
- ``execute_query``   — read-only-gated, named-parameter SQL
  (bigquery_warehouse.py:266-299 + bigquery_query.py:14-120)
- ``write_table``     — drop-and-replace load (bigquery_warehouse.py:111-122)
- ``upsert``          — staging + MERGE on key columns
  (bigquery_warehouse.py:124-179)
- ``append_aligned``  — append with column alignment: missing columns
  padded NULL, order matched to the target (bigquery_warehouse.py:310-348)
- ``normalize_column_types`` — drifted-type normalization via try_cast
  (bigquery_warehouse.py:181-243)
- sampling helpers    — top-|metric| / random / mixed reads
  (bigquery_warehouse.py:351-398)

Storage is path-based parquet (one directory per table) so the API works
against any filesystem; on a cluster deployment the same call shapes map
onto Delta/Iceberg ``MERGE INTO`` — the upsert here is the engine-neutral
join-merge plan (anti-join survivors + new rows), which is exactly what a
MERGE executes physically when every matched row is replaced.

Scale notes: upsert shuffles both sides once on the key; at 100 TB the
target should be partitioned (``partition_by``) so the rewrite touches
only affected partitions (dynamic partition overwrite), mirroring
incremental-model behavior (SURVEY.md §2.1).
"""

from __future__ import annotations

import os
import re
from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class QueryValidationError(ValueError):
    pass


# ------------------------------------------------------------ query gate

_COMMENT_RE = re.compile(r"--[^\n]*|/\*.*?\*/", re.S)
_STRING_RE = re.compile(r"'(?:[^']|'')*'")


def _strip_literals(sql: str) -> str:
    return _STRING_RE.sub("''", _COMMENT_RE.sub(" ", sql))


def validate_read_only(sql: str) -> None:
    """Single-statement SELECT gate (the reference parses with sqlglot,
    bigquery_query.py:57-103; same checks, parser-free)."""
    stripped = _strip_literals(sql).strip().rstrip(";")
    if ";" in stripped:
        raise QueryValidationError("multiple statements are not allowed")
    head = stripped.lstrip("( \n\t").split(None, 1)
    if not head or head[0].upper() not in ("SELECT", "WITH", "VALUES"):
        raise QueryValidationError(
            f"read-only queries must be SELECT; got {head[0] if head else ''!r}"
        )
    forbidden = re.compile(
        r"\b(INSERT|UPDATE|DELETE|MERGE|DROP|CREATE|ALTER|TRUNCATE|GRANT)\b",
        re.I,
    )
    m = forbidden.search(stripped)
    if m:
        raise QueryValidationError(f"forbidden statement keyword {m.group(0)}")


def _render_param(value) -> str:
    """Literal-render a named parameter (scalar / array / decimal), the
    typed-binding surface of bigquery_query.py:14-54."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, Decimal):
        return f"CAST('{value}' AS DECIMAL(38,9))"
    if isinstance(value, (date, datetime)):
        kind = "TIMESTAMP" if isinstance(value, datetime) else "DATE"
        return f"{kind} '{value.isoformat()}'"
    if isinstance(value, (list, tuple)):
        return "ARRAY(" + ", ".join(_render_param(v) for v in value) + ")"
    if isinstance(value, str):
        escaped = value.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    raise QueryValidationError(f"unsupported parameter type {type(value)!r}")


_PARAM_RE = re.compile(r"@([A-Za-z_][A-Za-z_0-9]*)")


def bind_params(sql: str, params: dict | None) -> str:
    params = params or {}
    used: set[str] = set()

    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise QueryValidationError(f"missing query parameter @{name}")
        used.add(name)
        return _render_param(params[name])

    # Only substitute outside string literals.
    parts, out, last = [], [], 0
    for m in _STRING_RE.finditer(sql):
        parts.append((last, m.start(), True))
        parts.append((m.start(), m.end(), False))
        last = m.end()
    parts.append((last, len(sql), True))
    for a, b, active in parts:
        seg = sql[a:b]
        out.append(_PARAM_RE.sub(sub, seg) if active else seg)
    unused = set(params) - used
    if unused:
        raise QueryValidationError(f"unused parameters: {sorted(unused)}")
    return "".join(out)


def add_safety_limit(sql: str, limit: int = 1000) -> str:
    """Wrap a validated SELECT in an outer LIMIT — the NL->SQL guard
    (nl_to_sql_module.py:172 auto LIMIT 1000). Wrapping (not appending)
    is limit-idempotent: an inner LIMIT still wins if smaller."""
    validate_read_only(sql)
    return f"SELECT * FROM ({sql.strip().rstrip(';')}) __guarded LIMIT {limit}"


class Warehouse:
    """Path-based parquet warehouse with the reference's resource API."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # ------------------------------------------------------------ reads

    def table_path(self, name: str) -> str:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", name):
            raise QueryValidationError(f"invalid table name {name!r}")
        return os.path.join(self.base_dir, name)

    def table(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.table_path(name))

    def register_views(self, *names: str) -> None:
        for n in names:
            self.table(n).createOrReplaceTempView(n)

    def execute_query(
        self,
        sql: str,
        params: dict | None = None,
        read_only: bool = True,
    ) -> DataFrame:
        bound = bind_params(sql, params)
        if read_only:
            validate_read_only(bound)
        return self.spark.sql(bound)

    # ----------------------------------------------------------- writes

    def write_table(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None
    ) -> None:
        """Drop-and-replace (WRITE_TRUNCATE)."""
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.table_path(name))

    def upsert(
        self,
        df: DataFrame,
        name: str,
        key_columns: list[str],
        partition_by: list[str] | None = None,
    ) -> None:
        """MERGE: update matched keys, insert new ones. Engine-neutral
        join-merge; maps 1:1 onto Delta/Iceberg MERGE INTO on a cluster."""
        if not key_columns:
            raise QueryValidationError("upsert requires key columns")
        path = self.table_path(name)
        if not os.path.exists(path):
            self.write_table(df, name, partition_by)
            return
        target = self.table(name)
        missing = [c for c in df.columns if c not in target.columns]
        if missing:
            raise QueryValidationError(
                f"columns {missing} not in target table {name}"
            )
        staged = self._align(df, target.columns)
        survivors = target.join(
            staged.select(*key_columns).distinct(), key_columns, "left_anti"
        )
        merged = survivors.unionByName(staged)
        # Parquet source can't overwrite in place while reading itself —
        # stage to a sibling dir, then swap (what a transactional format
        # does under the hood with its log).
        tmp = path + "__staging"
        w = merged.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        old = path + "__old"
        os.rename(path, old)
        os.rename(tmp, path)
        import shutil

        shutil.rmtree(old)

    def append_aligned(self, df: DataFrame, name: str) -> None:
        """Append, padding missing columns with NULL and matching the
        target's column order (bigquery_warehouse.py:310-348)."""
        target_cols = self.table(name).schema
        extra = [
            c for c in df.columns if c not in {f.name for f in target_cols}
        ]
        if extra:
            raise QueryValidationError(
                f"dataframe has columns {extra} not present in {name}"
            )
        aligned = df.select(
            *[
                F.col(f.name).cast(f.dataType)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in target_cols
            ]
        )
        aligned.write.mode("append").parquet(self.table_path(name))

    @staticmethod
    def _align(df: DataFrame, cols: list[str]) -> DataFrame:
        return df.select(
            *[
                F.col(c) if c in df.columns else F.lit(None).alias(c)
                for c in cols
            ]
        )

    def normalize_column_types(
        self, df: DataFrame, schema: dict[str, str]
    ) -> DataFrame:
        """try_cast drifted columns to the canonical type
        (bigquery_warehouse.py:181-243 SAFE_CAST normalization)."""
        return df.select(
            *[
                F.expr(f"try_cast({c} AS {schema[c]})").alias(c)
                if c in schema
                else F.col(c)
                for c in df.columns
            ]
        )

    # --------------------------------------------------------- sampling

    def sample_top(
        self, name: str, metric: str, k: int, columns: list[str] | None = None
    ) -> DataFrame:
        df = self.table(name)
        if columns:
            df = df.select(*columns, metric)
        return df.orderBy(F.abs(F.col(metric)).desc()).limit(k)

    def sample_random(self, name: str, k: int, seed: int = 42) -> DataFrame:
        return self.table(name).orderBy(F.rand(seed)).limit(k)

    def sample_mixed(
        self, name: str, metric: str, k: int, seed: int = 42
    ) -> DataFrame:
        half = k // 2
        top = self.sample_top(name, metric, half)
        rnd = self.sample_random(name, k - half, seed)
        return top.unionByName(rnd).dropDuplicates()

    def distinct_values(self, name: str, column: str) -> DataFrame:
        return (
            self.table(name)
            .select(column)
            .where(F.col(column).isNotNull())
            .distinct()
            .orderBy(column)
        )

    # ----------------------------------------------- incremental pattern

    def high_watermark(self, name: str, column: str):
        """MAX(column) of the target, or None if the table is absent —
        the is_incremental() scan-window guard (SURVEY.md §2.1)."""
        if not os.path.exists(self.table_path(name)):
            return None
        row = self.table(name).agg(F.max(column).alias("hw")).collect()[0]
        return row.hw

    def incremental_upsert(
        self,
        source: DataFrame,
        name: str,
        key_columns: list[str],
        watermark_column: str,
        grace=None,
    ) -> None:
        """Filter source to rows newer than MAX(watermark) - grace, then
        MERGE (agent_treasury_yield_curve_spreads.sql:26-31 shape).
        ``grace=None`` means strictly-newer rows only."""
        hw = self.high_watermark(name, watermark_column)
        if hw is not None:
            if grace is None:
                source = source.where(F.col(watermark_column) > F.lit(hw))
            else:
                source = source.where(
                    F.col(watermark_column) >= F.lit(hw) - grace
                )
        self.upsert(source, name, key_columns)


def scd2_apply(
    current: DataFrame | None,
    changes: DataFrame,
    key_columns: list[str],
    compare_columns: list[str],
    effective_column: str,
):
    """Type-2 slowly-changing-dimension merge (the point-in-time snapshot
    discipline of the backtesting layer, SURVEY.md §1.1: SCD2-style
    tables keyed by snapshot_date for look-ahead-free backtesting).

    ``current`` is the existing SCD2 table (or None on first load) with
    bookkeeping columns valid_from / valid_to / is_current; ``changes``
    is the new snapshot of the dimension at ``effective_column``'s value
    per row. Rows whose compared attributes changed close the old version
    (valid_to = new effective date) and open a new current one. Pure
    DataFrame plan — one join on the business key, no driver loops.
    """
    from pyspark.sql import functions as F

    eff = F.col(effective_column)
    fresh = changes.select(
        *key_columns,
        *compare_columns,
        eff.alias("valid_from"),
        F.lit(None).cast(changes.schema[effective_column].dataType).alias(
            "valid_to"
        ),
        F.lit(True).alias("is_current"),
    )
    if current is None:
        return fresh

    cur = current.where(F.col("is_current"))
    hist = current.where(~F.col("is_current"))

    cmp_cond = None
    for c in compare_columns:
        diff = ~F.col(f"cur.{c}").eqNullSafe(F.col(f"chg.{c}"))
        cmp_cond = diff if cmp_cond is None else (cmp_cond | diff)

    joined = cur.alias("cur").join(
        fresh.alias("chg"), key_columns, "full_outer"
    )
    key_is_new = F.col(f"cur.{compare_columns[0]}").isNull() & F.col(
        "cur.valid_from"
    ).isNull()
    changed = cmp_cond & F.col("chg.valid_from").isNotNull()

    # old versions to close (attribute changed): valid_to = change date
    closed = (
        joined.where(changed & ~key_is_new)
        .select(
            *key_columns,
            *[F.col(f"cur.{c}").alias(c) for c in compare_columns],
            F.col("cur.valid_from").alias("valid_from"),
            F.col("chg.valid_from").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    # unchanged current rows survive as-is
    unchanged = joined.where(
        F.col("chg.valid_from").isNull()
        | (~changed & F.col("cur.valid_from").isNotNull())
    ).select(
        *key_columns,
        *[F.col(f"cur.{c}").alias(c) for c in compare_columns],
        F.col("cur.valid_from").alias("valid_from"),
        F.col("cur.valid_to").alias("valid_to"),
        F.col("cur.is_current").alias("is_current"),
    )
    # new versions: changed attributes or brand-new keys
    opened = joined.where(
        F.col("chg.valid_from").isNotNull()
        & (changed | F.col("cur.valid_from").isNull())
    ).select(
        *key_columns,
        *[F.col(f"chg.{c}").alias(c) for c in compare_columns],
        F.col("chg.valid_from").alias("valid_from"),
        F.col("chg.valid_to").alias("valid_to"),
        F.col("chg.is_current").alias("is_current"),
    )
    return hist.unionByName(closed).unionByName(unchanged).unionByName(
        opened
    )
