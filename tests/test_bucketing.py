"""Co-located bucketed joins: two tables bucketed on the same key with
the same bucket count must join and aggregate with ZERO shuffle
Exchange — the plan property that makes repeated key-joins free at
100 TB (SCALE.md 'Joins')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from work_order_pdf_extractor_spark.plans import bucketing

DB = "bucketing_test_db"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketed_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB} LOCATION '{loc}'")
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 97).alias("v1")
    )
    right = spark.range(0, 5000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v2")
    )
    bucketing.write_bucketed(left, f"{DB}.lhs", "k", 8)
    bucketing.write_bucketed(right, f"{DB}.rhs", "k", 8)
    yield f"{DB}.lhs", f"{DB}.rhs"
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    lhs, rhs = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path so bucket elision (not broadcast)
        # is what removes the Exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketing.read_bucketed(spark, lhs).join(
            bucketing.read_bucketed(spark, rhs), "k"
        )
        plan = _executed_plan(j)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
        # and the result is right
        assert j.count() == 2500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    lhs, _ = bucketed_tables
    agg = (
        bucketing.read_bucketed(spark, lhs)
        .groupBy("k")
        .agg(F.sum("v1").alias("s"))
    )
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join against an UNbucketed side must shuffle —
    proving the elision above comes from the bucket layout."""
    lhs, _ = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain = spark.range(0, 5000, 2).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("v2")
        )
        j = bucketing.read_bucketed(spark, lhs).join(plain, "k")
        assert "Exchange" in _executed_plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
