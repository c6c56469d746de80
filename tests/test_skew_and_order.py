"""Salted repartition + stable turn ordering (north rule; SURVEY §2.5 W2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from work_order_pdf_extractor_spark.plans import skew


def test_salted_repartition_preserves_rows(transcripts_df, tiny_transcripts_pd):
    out = skew.repartition_salted(transcripts_df, 16, whale_threshold=100)
    assert out.count() == len(tiny_transcripts_pd)
    assert set(out.columns) == set(transcripts_df.columns)


def test_whale_spreads_over_partitions(spark, transcripts_df, tiny_transcripts_pd):
    # the tiny fixture has one whale conversation (~400 turns)
    whale = tiny_transcripts_pd.conv_id.value_counts().idxmax()
    out = skew.repartition_salted(transcripts_df, 16, whale_threshold=100, n_salts=8)
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .filter(F.col("conv_id") == whale)
        .select("pid").distinct().count()
    )
    assert parts > 1, "whale conversation not spread by salting"


def test_small_conversations_stay_colocated(spark, transcripts_df, tiny_transcripts_pd):
    whale = tiny_transcripts_pd.conv_id.value_counts().idxmax()
    out = skew.repartition_salted(transcripts_df, 16, whale_threshold=100)
    multi = (
        out.withColumn("pid", F.spark_partition_id())
        .filter(F.col("conv_id") != whale)
        .groupBy("conv_id")
        .agg(F.countDistinct("pid").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert multi == 0


def test_with_turn_order_is_stable(transcripts_df):
    out = skew.with_turn_order(transcripts_df)
    bad = out.filter(F.col("turn_order") != F.col("turn_idx") + 1).count()
    assert bad == 0  # turn_idx is 0-based and dense in the fixture
