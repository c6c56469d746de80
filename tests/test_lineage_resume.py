"""Checkpoint / lineage / idempotent-resume property tests (SURVEY §7 risk 4)."""

from __future__ import annotations

import os
import shutil

from work_order_pdf_extractor_spark.plans import lineage


def _run(spark, transcripts_df, ref_orders_df, out_dir, **kw):
    return lineage.run_with_checkpoint(
        spark, transcripts_df, ref_orders_df, str(out_dir), n_buckets=8, **kw
    )


def test_full_run_then_noop_rerun(spark, transcripts_df, ref_orders_df, golden_pd, tmp_path):
    out = tmp_path / "ckpt"
    s1 = _run(spark, transcripts_df, ref_orders_df, out, run_id="r1")
    assert s1["buckets_done"] > 0 and s1["buckets_skipped"] == 0

    df1 = lineage.read_output(spark, str(out)).toPandas()
    assert len(df1) == len(golden_pd)

    s2 = _run(spark, transcripts_df, ref_orders_df, out, run_id="r2")
    assert s2["buckets_done"] == 0, "rerun reprocessed committed buckets"
    assert s2["buckets_skipped"] == s1["buckets_done"]

    df2 = lineage.read_output(spark, str(out)).toPandas()
    a = df1.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    b = df2.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert a["extracted_text"].fillna("\0").equals(b["extracted_text"].fillna("\0"))


def test_resume_after_partial_crash(spark, transcripts_df, ref_orders_df, golden_pd, tmp_path):
    out = tmp_path / "ckpt2"
    _run(spark, transcripts_df, ref_orders_df, out, run_id="r1")
    # simulate a crash that lost two buckets (data + lineage rows)
    dd = os.path.join(out, "data")
    lost = sorted(os.listdir(dd))[:2]
    for name in lost:
        shutil.rmtree(os.path.join(dd, name))
    for f in os.listdir(os.path.join(out, "_lineage")):
        if any(f.startswith(f"bucket-{int(n.split('=')[1]):05d}") for n in lost):
            os.remove(os.path.join(out, "_lineage", f))

    s2 = _run(spark, transcripts_df, ref_orders_df, out, run_id="r2")
    assert s2["buckets_done"] == len(lost)

    df = lineage.read_output(spark, str(out)).toPandas()
    assert len(df) == len(golden_pd)


def test_crash_between_rename_and_lineage_repairs(spark, transcripts_df, ref_orders_df, tmp_path):
    out = tmp_path / "ckpt3"
    _run(spark, transcripts_df, ref_orders_df, out, run_id="r1")
    # bucket dir exists but its lineage row vanished (the crash window)
    victim = sorted(os.listdir(os.path.join(out, "data")))[0]
    b = int(victim.split("=")[1])
    for f in os.listdir(os.path.join(out, "_lineage")):
        if f.startswith(f"bucket-{b:05d}"):
            os.remove(os.path.join(out, "_lineage", f))

    s2 = _run(spark, transcripts_df, ref_orders_df, out, run_id="r2")
    assert s2["buckets_done"] == 0, "visible bucket was reprocessed"


def test_lineage_rows_have_failure_counts(spark, transcripts_df, ref_orders_df, golden_pd, tmp_path):
    out = tmp_path / "ckpt4"
    _run(spark, transcripts_df, ref_orders_df, out, run_id="r1")
    lin = lineage.read_lineage(spark, str(out)).toPandas()
    assert int(lin.rows_out.sum()) == len(golden_pd)
    assert int(lin.n_failed.sum()) == int((golden_pd.status != "ok").sum())
