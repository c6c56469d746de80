"""Temporal joins Spark lacks as built-ins: AS-OF and bounded RANGE join.

Both are implemented as compositions of existing DataFrame ops in the
shapes that scale (the task's 'custom operator' tier (a)):

- :func:`asof_join` — union the tagged streams and take ``last(...,
  ignorenulls)`` over a per-key event-time window: ONE shuffle + sort per
  key, never a per-row subquery or cross join. This is the classic
  sort-based as-of used by kdb/Flink pipelines.
- :func:`range_join_agg` — band join: bucket both sides by the range
  length, probe each left row against its own and the previous bucket
  (a right row within ``(l.ts - range, l.ts]`` lands in one of the two),
  filter exactly, aggregate. Join keys are (key, bucket) equality — hash
  join, never a BroadcastNestedLoopJoin on the inequality.

The DuckDB oracles use the engine-native formulations (``ASOF JOIN`` and
a plain inequality join), so the compositions are differentially checked
against an independent implementation of the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same key (inclusive as-of semantics,
    matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``).

    Plan: tag the sides, union, and run ``last(..., ignorenulls=True)``
    over a window ordered by (ts, side DESC) so a right row at exactly
    left.ts is visible to it. One hash-partition shuffle on the key plus
    a sort — linear, no join blow-up; at 100 TB this is the as-of shape
    that survives (the naive formulation is a per-row range subquery).

    Determinism: when several right rows share (key, ts), the window's
    final tiebreak orders them by their value columns ascending, so
    ``last()`` picks the lexicographic MAX — a pinned rule instead of
    partitioning-dependent arbitrary choice (ADVICE r2; DuckDB's native
    ASOF JOIN picks arbitrarily there, so oracles must pre-reduce ties)."""
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).withColumn("_side", F.lit(1))
    l = left.withColumn("_side", F.lit(0))
    tagged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("_side").desc(),
            *[F.col(f"_r_{c}").asc_nulls_first() for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = tagged.withColumn(
        f"{prefix}{ts_col}",
        F.last(
            F.when(F.col("_side") == 1, F.col(ts_col)), ignorenulls=True
        ).over(w),
    )
    for c in value_cols:
        out = out.withColumn(
            f"{prefix}{c}",
            F.last(
                F.when(F.col("_side") == 1, F.col(f"_r_{c}")),
                ignorenulls=True,
            ).over(w),
        )
    drop = ["_side"] + [f"_r_{c}" for c in value_cols]
    return out.filter(F.col("_side") == 0).drop(*drop)


def range_join_agg(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    range_seconds: int,
    left_id_cols: list[str],
) -> DataFrame:
    """Per left row: count and DECIMAL-exact sum of right rows with
    ``r.ts ∈ (l.ts - range, l.ts]`` for the same key.

    Band join: bucket = floor(epoch_seconds / range). A qualifying right
    row lands in bucket(l) or bucket(l)-1 (bucket size == range length),
    so each left row probes exactly two (key, bucket) hash keys — the
    inequality never reaches the join condition, which would degrade to a
    nested-loop join. Output: left_id_cols + (n_in_range, sum_in_range)."""
    # bucket needs monotone integer seconds, engine-internal only (the
    # filter below uses the raw timestamps); NTZ must route through
    # timestamp before the long cast
    def _secs(c: F.Column) -> F.Column:
        return c.cast("timestamp").cast("long")

    lb = F.floor(_secs(F.col(ts_col)) / range_seconds)
    l2 = left.select(
        *left_id_cols,
        F.col(key_col),
        F.col(ts_col).alias("_l_ts"),
        F.explode(F.array(lb, lb - 1)).alias("_bucket"),
    )
    r2 = right.select(
        F.col(key_col),
        F.col(ts_col).alias("_r_ts"),
        F.col(value_col).alias("_r_val"),
        F.floor(_secs(F.col(ts_col)) / range_seconds).alias("_bucket"),
    )
    joined = l2.join(r2, [key_col, "_bucket"], "left")
    in_range = (
        F.col("_r_ts").isNotNull()
        & (F.col("_r_ts") > F.col("_l_ts") - F.expr(f"INTERVAL {range_seconds} SECONDS"))
        & (F.col("_r_ts") <= F.col("_l_ts"))
    )
    return (
        joined.groupBy(*left_id_cols, key_col)
        .agg(
            F.sum(F.when(in_range, 1).otherwise(0)).cast("long").alias("n_in_range"),
            F.sum(
                F.when(in_range, F.col("_r_val")).cast("decimal(18,4)")
            ).cast("double").alias("sum_in_range"),
        )
    )
