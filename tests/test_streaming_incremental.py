"""Incremental (micro-batch) pipeline: backlog processing, checkpoint
resume, per-batch metrics (SURVEY §2.8)."""

from __future__ import annotations

import os

import pytest

from work_order_pdf_extractor_spark.streaming import incremental


@pytest.fixture(scope="module")
def input_dir(tmp_path_factory, tiny_transcripts_pd):
    d = tmp_path_factory.mktemp("stream_in")
    # three "arrival" files = at least one micro-batch each under a cap
    n = len(tiny_transcripts_pd)
    for i, lo in enumerate(range(0, n, n // 3 + 1)):
        chunk = tiny_transcripts_pd.iloc[lo : lo + n // 3 + 1]
        chunk.to_parquet(d / f"arrival-{i}.parquet", index=False)
    return str(d)


def test_available_now_processes_backlog(spark, input_dir, ref_orders_df, golden_pd, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    incremental.run_incremental(
        spark, input_dir, ref_orders_df, out, ckpt, max_files_per_batch=1
    )
    res = spark.read.parquet(out).toPandas()
    assert len(res) == len(golden_pd)
    assert res.batch_id.nunique() >= 2, "expected multiple micro-batches"
    # per-turn equality holds through the streaming path too
    m = res.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    g = golden_pd.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert m.extracted_text.fillna("\0").equals(g.extracted_text.fillna("\0"))
    assert (m.matched.values == g.matched.values).all()


def test_checkpoint_resume_skips_processed(spark, input_dir, ref_orders_df, golden_pd, tmp_path):
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    incremental.run_incremental(
        spark, input_dir, ref_orders_df, out, ckpt, max_files_per_batch=1
    )
    n1 = len(spark.read.parquet(out).toPandas())
    # rerun with the same checkpoint: nothing new to process, no duplicates
    incremental.run_incremental(
        spark, input_dir, ref_orders_df, out, ckpt, max_files_per_batch=1
    )
    n2 = len(spark.read.parquet(out).toPandas())
    assert n1 == n2 == len(golden_pd)


def test_replayed_batch_is_idempotent(spark, input_dir, ref_orders_df, golden_pd, tmp_path):
    """foreachBatch is at-least-once: simulate a crash AFTER the parquet
    write but BEFORE the checkpoint commit by deleting the newest commit
    file — the rerun replays that micro-batch with the same batch_id, and
    the dynamic-partition-overwrite sink must not duplicate rows."""
    out = str(tmp_path / "out4")
    ckpt = str(tmp_path / "ckpt4")
    incremental.run_incremental(
        spark, input_dir, ref_orders_df, out, ckpt, max_files_per_batch=1
    )
    n1 = len(spark.read.parquet(out).toPandas())
    commits = sorted(
        c for c in os.listdir(os.path.join(ckpt, "commits"))
        if not c.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    incremental.run_incremental(
        spark, input_dir, ref_orders_df, out, ckpt, max_files_per_batch=1
    )
    n2 = len(spark.read.parquet(out).toPandas())
    assert n1 == n2 == len(golden_pd)


def test_new_arrivals_only_are_processed(spark, input_dir, ref_orders_df, tiny_transcripts_pd, tmp_path):
    out = str(tmp_path / "out3")
    ckpt = str(tmp_path / "ckpt3")
    incremental.run_incremental(spark, input_dir, ref_orders_df, out, ckpt)
    base = len(spark.read.parquet(out).toPandas())
    # a new file arrives
    extra = tiny_transcripts_pd.head(50).copy()
    extra["conv_id"] = "conv-late-" + extra["conv_id"]
    extra.to_parquet(os.path.join(input_dir, "arrival-late.parquet"), index=False)
    try:
        incremental.run_incremental(spark, input_dir, ref_orders_df, out, ckpt)
        after = spark.read.parquet(out).toPandas()
        assert len(after) == base + 50
        assert after.conv_id.str.startswith("conv-late-").sum() == 50
    finally:
        os.remove(os.path.join(input_dir, "arrival-late.parquet"))
