"""Hierarchy resolution + thread-structure metrics.

Mirror of ``dbt_project/models/analysis/reddit_thread_structure.sql``
(thread-level rollups over parent/depth comment chains) and the
``stg_reddit_comments`` depth derivation it assumes upstream: given a
parent-edge relation, resolve every node's root and depth, then compute
per-thread structure metrics (total/reply counts, max/avg depth,
deep-thread and quality flags, reddit_thread_structure.sql:25-80).

The event log has no explicit parent_id, so edges are derived
deterministically: an event's parent is the same user's previous event
when the gap is <= 6 hours (session threading); otherwise it starts a
new thread. Chains are resolved with **pointer doubling** (path
halving): each of O(log max_depth) rounds joins the pointer table to
itself, jumping every node's ancestor pointer twice as far. That is the
scale-correct distributed formulation — depth-by-depth peeling (the
recursive-CTE shape DuckDB runs in the oracle) needs O(depth) passes
and leaves most of the cluster idle per round, while pointer doubling
is O(log d) full-parallel shuffles. Each round is localCheckpoint'ed so
both the lineage AND the logical plan stay constant-size per round (a
persisted-only round doubles the plan each iteration).

The single driver-side scalar (max events per user, an upper bound on
chain length) sizes the iteration count — a metadata aggregate, same
pattern as MLlib's iterative jobs, not a data collect.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caches import free_local_checkpoint, register_session_checkpoint
from ..catalog import load_table
from ..functions.parity import davg, dsum, sql_davg, sql_dsum
from ..registry import query

SESSION_GAP_HOURS = 6

_ORACLE = f"""
WITH RECURSIVE edges AS (
  SELECT event_id, user_id, ts, event_type, value,
    LAG(event_id) OVER w AS prev_id,
    LAG(ts) OVER w AS prev_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
linked AS (
  SELECT event_id, user_id, event_type, value,
    (CASE WHEN prev_ts IS NOT NULL
           AND ts - prev_ts <= INTERVAL {SESSION_GAP_HOURS} HOUR
          THEN prev_id END) AS parent_id
  FROM edges
),
resolved AS (
  SELECT event_id, user_id, event_type, value,
         event_id AS root_id, 0 AS depth
  FROM linked WHERE parent_id IS NULL
  UNION ALL
  SELECT l.event_id, l.user_id, l.event_type, l.value,
         r.root_id, r.depth + 1
  FROM linked l JOIN resolved r ON l.parent_id = r.event_id
)
SELECT root_id AS thread_id,
  CAST(MIN(user_id) AS BIGINT) AS user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(*) - 1 AS BIGINT) AS n_replies,
  CAST(MAX(depth) AS BIGINT) AS max_depth,
  {sql_davg("depth")} AS avg_depth,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_purchases,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_errors,
  {sql_dsum("value")} AS total_value,
  (MAX(depth) >= 3 AND COUNT(*) >= 4) AS is_deep_thread,
  (CASE WHEN MAX(depth) >= 3 THEN 'high'
        WHEN MAX(depth) >= 1 THEN 'medium'
        ELSE 'low' END) AS thread_quality
FROM resolved
GROUP BY root_id
ORDER BY thread_id
"""


def resolve_hierarchy(linked: DataFrame) -> DataFrame:
    """Pointer-doubling root/depth resolution over (event_id, parent_id).

    Returns (event_id, root_id, depth). ``parent_id`` NULL marks roots.
    """
    root_flag = F.when(F.col("parent_id").isNull(), 1).otherwise(0)
    depth_seed = F.when(F.col("parent_id").isNull(), 0).otherwise(1)
    # Bound on chain length -> iteration count (metadata scalar). When
    # the frame carries the session order (ts), the exact longest run
    # via gaps-and-islands over the root flag — each extra doubling
    # round is a full self-join, so a tight bound matters. For generic
    # forests (no ts) fall back to the loose max-events-per-user bound.
    #
    # r15 (guide §2.4 "two operations keyed the same way share one
    # exchange"): the gaps-and-islands `grp` rides the SAME
    # (user_id, ts) window pass that the initial pointer checkpoint
    # already materializes, so the bound job becomes a cheap aggregate
    # over the CHECKPOINTED rows instead of a second full scan + sort
    # of the edge frame (the previous shape computed the session
    # window twice per invocation — measured ~2s of thread_structure's
    # bench cost, and at 100 TB a whole extra pass over the edges).
    if "ts" in linked.columns:
        wq = Window.partitionBy("user_id").orderBy("ts", "event_id")
        wcum = wq.rowsBetween(Window.unboundedPreceding, 0)
        base = linked.select(
            F.col("event_id").alias("id"),
            F.coalesce("parent_id", "event_id").alias("anc"),
            depth_seed.alias("d"),
            "user_id",
            F.sum(root_flag).over(wcum).alias("grp"),
        ).localCheckpoint(eager=True)
        max_chain = (
            base.groupBy("user_id", "grp")
            .agg(F.count("*").alias("n"))
            .agg(F.max("n"))
            .first()[0]
            or 1
        )
        ptr = base.select("id", "anc", "d")
    else:
        ptr = linked.select(
            F.col("event_id").alias("id"),
            F.coalesce("parent_id", "event_id").alias("anc"),
            depth_seed.alias("d"),
        ).localCheckpoint(eager=True)
        base = ptr
        max_chain = (
            linked.groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .agg(F.max("n"))
            .first()[0]
            or 1
        )
    # NOTE on the hop join strategy: an r15 experiment size-routed the
    # hop side through F.broadcast() below (the checkpointed frame has
    # no stats, so Catalyst plans SortMergeJoin) — measured NO faster
    # at bench scale (2.9s vs 2.5s for 4 rounds: the per-round driver
    # collect + broadcast build offsets the saved shuffle on a 100k-row
    # table), so the plain shuffle join stays.
    for _ in range(max(1, math.ceil(math.log2(max(2, max_chain))))):
        hop = ptr.select(
            F.col("id").alias("h_id"),
            F.col("anc").alias("h_anc"),
            F.col("d").alias("h_d"),
        )
        nxt = (
            ptr.join(hop, ptr.anc == hop.h_id)
            .select(
                "id",
                F.col("h_anc").alias("anc"),
                (F.col("d") + F.col("h_d")).alias("d"),
            )
            # localCheckpoint, not persist (r9): each round SELF-joins
            # the prior round (two reads of one frame), so persist made
            # execution linear — but it left the LOGICAL plan intact,
            # and a plan that references its predecessor twice DOUBLES
            # per round: 2^rounds rendered subtrees, exponential
            # plan-string/analysis cost on the driver at depth (the
            # identical hazard text/dedup.connected_components fixed).
            # eager=True truncates every round to a bare LogicalRDD —
            # constant plan size at any depth; superseded rounds are
            # freed through the shared guarded helper. On a real
            # cluster prefer checkpoint() with a checkpoint dir for
            # executor-loss tolerance.
            .localCheckpoint(eager=True)
        )
        # round 1 consumes the INITIAL checkpoint through the `ptr`
        # projection — free the underlying `base` frame (on the ts path
        # ptr is a projection, not the storage owner); later rounds own
        # their checkpoint directly
        free_local_checkpoint(base if base is not None else ptr)
        base = None
        ptr = nxt
    # the FINAL generation escapes into the returned plan, so it cannot
    # be freed here (consumers read it lazily) and DataFrame.unpersist
    # cannot see LogicalRDD storage — register it so
    # caches.free_session_caches() releases it (ADVICE r9: one leaked
    # event-scale checkpoint per invocation otherwise)
    register_session_checkpoint(ptr)
    return ptr.select(
        F.col("id").alias("event_id"),
        F.col("anc").alias("root_id"),
        F.col("d").alias("depth"),
    )


@query("thread_structure", oracle=_ORACLE)
def thread_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r16 (guide §8 — use what the optimizer cannot know): THIS query's
    # parent edges are session-threading links — an event's parent is
    # always the SAME user's immediately preceding event (gap <= 6h) —
    # so every tree is a contiguous run ("island") of the (user_id,
    # ts, event_id)-ordered event sequence. Root and depth are
    # therefore single-window-pass derivable: root_id = the last
    # root-flagged event_id at-or-before the row, depth = row_number
    # minus the root's row_number (both running aggregates over the
    # SAME partition/ordering the root flag itself needs, sharing one
    # exchange+sort, guide §2.4). The generic pointer-doubling
    # resolver (resolve_hierarchy above, kept for arbitrary forests)
    # needed O(log depth) blocking self-join + localCheckpoint rounds
    # — ~9 sequential jobs at bench scale and 7 extra shuffles of the
    # edge table at any scale — to compute exactly the same columns.
    # Result equality vs the recursive-CTE oracle is pinned by the
    # DuckDB hash oracle; per-island equivalence: parent_id IS NULL
    # starts an island, every non-root's parent is the previous row,
    # so depth(row) = position within island = rn - rn(island root).
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = SESSION_GAP_HOURS * 3600 * 1_000_000
    is_root = ~(
        F.lag("ts").over(w).isNotNull()
        & (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            <= gap_us
        )
    )
    flagged = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts",
        is_root.alias("is_root"),
        F.row_number().over(w).alias("__rn"),
    )
    resolved = flagged.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.last(
            F.when(F.col("is_root"), F.col("event_id")),
            ignorenulls=True,
        )
        .over(wcum)
        .alias("root_id"),
        (
            F.col("__rn")
            - F.max(F.when(F.col("is_root"), F.col("__rn"))).over(wcum)
        ).alias("depth"),
    )
    return (
        resolved.groupBy(F.col("root_id").alias("thread_id"))
        .agg(
            F.min("user_id").alias("user_id"),
            F.count("*").alias("n_events"),
            (F.count("*") - 1).alias("n_replies"),
            F.max("depth").cast("long").alias("max_depth"),
            davg("depth").alias("avg_depth"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_purchases"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("n_errors"),
            dsum("value").alias("total_value"),
            ((F.max("depth") >= 3) & (F.count("*") >= 4)).alias(
                "is_deep_thread"
            ),
            F.when(F.max("depth") >= 3, "high")
            .when(F.max("depth") >= 1, "medium")
            .otherwise("low")
            .alias("thread_quality"),
        )
        .orderBy("thread_id")
    )
