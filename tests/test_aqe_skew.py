"""AQE skew-join: SCALE.md and operators/lm.py lean on the runtime skew
split for Zipf-hot probe keys — this test DEMONSTRATES it rather than
assuming it (VERDICT r5 ask #7): on a whale-keyed fixture the final
adaptive plan must show the split (``SortMergeJoin(skew=true)`` /
``AQEShuffleRead skewed``) and the values must be identical with the
rule on and off.

What the rule requires (worth pinning, it took measurement to learn):
both SMJ children must be BARE shuffle stages from ENSURE_REQUIREMENTS
(a user ``repartition()`` or an aggregate between shuffle and join
disqualifies the stage), and the skewed partition's POST-COMPRESSION
shuffle bytes must exceed ``skewedPartitionThresholdInBytes`` — a
constant pad column compresses away and never trips the threshold."""

from __future__ import annotations

from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def _whale_join(spark):
    # 98% of 120k rows share one key; md5 pad defeats shuffle
    # compression so the whale partition's on-wire size trips the
    # (test-scaled) threshold the way a real hot key would at scale.
    left = spark.range(0, 120000).select(
        F.when(F.col("id") % 100 < 98, F.lit("whale"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        F.md5(F.col("id").cast("string")).alias("pad"),
        F.col("id"),
    )
    right = spark.createDataFrame(
        [("whale", 1.0)] + [(f"k{i}", float(i)) for i in range(7)],
        "k string, w double",
    )
    return left.join(right, "k")


def _with_confs(spark, confs):
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf
            saved[k] = None
        spark.conf.set(k, v)
    return saved


def _restore(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_skew_join_split_fires_and_values_unchanged(spark):
    saved = _with_confs(spark, _SKEW_CONFS)
    try:
        j = _whale_join(spark)
        skew_rows = sorted((r.k, r.id, r.w) for r in j.collect())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        j2 = _whale_join(spark)
        plain_rows = sorted((r.k, r.id, r.w) for r in j2.collect())
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in plan2
        assert skew_rows == plain_rows
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        _restore(spark, saved)


def test_skew_split_needs_bare_shuffle_stage(spark):
    """Negative control pinning the documented boundary: a user
    repartition() on the probe side (REPARTITION_BY_COL, not
    ENSURE_REQUIREMENTS) disqualifies the stage and the split must NOT
    fire — which is why the engine's skew answer for pre-partitioned
    inputs is salting (plans/skew.py), not AQE."""
    saved = _with_confs(spark, _SKEW_CONFS)
    try:
        left = spark.range(0, 120000).select(
            F.when(F.col("id") % 100 < 98, F.lit("whale"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.createDataFrame(
            [("whale", 1.0)] + [(f"k{i}", float(i)) for i in range(7)],
            "k string, w double",
        )
        j = left.join(right.repartition(8, "k"), "k")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in plan
    finally:
        _restore(spark, saved)
