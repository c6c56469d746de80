"""Watermark + event-time tumbling window (SURVEY §2.8): a window is
emitted exactly once when the watermark closes it, and data arriving after
the eviction is dropped instead of duplicating the window."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from work_order_pdf_extractor_spark.streaming import windowed


def _turns(ts_list, role="user"):
    return pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(ts_list))],
            "turn_idx": pd.array(range(len(ts_list)), dtype="int32"),
            "role": role,
            "text": "hello world",
            "tool": "",
            "ts": pd.to_datetime(ts_list).astype("datetime64[us]"),
        }
    )


@pytest.fixture()
def arrivals(tmp_path):
    """Four single-file micro-batches. Spark applies the watermark with a
    one-batch lag (the watermark for batch N derives from batch N-1's max
    event time), so:

    - b0: three on-time events in window [00:00, 00:10)
    - b1: 00:31 → watermark becomes 00:21 for b2
    - b2: 00:45 → during b2 wm=00:21 closes+emits the first window (n=3);
          watermark becomes 00:35 for b3
    - b3: a LATE 00:02:30 arrives AFTER its window was evicted — must be
          dropped, not re-open the window (append mode emits once).
    """
    d = tmp_path / "in"
    d.mkdir()
    batches = [
        ["2026-01-01 00:01:00", "2026-01-01 00:02:00", "2026-01-01 00:05:00"],
        ["2026-01-01 00:31:00"],
        ["2026-01-01 00:45:00"],
        ["2026-01-01 00:02:30"],
    ]
    for i, ts in enumerate(batches):
        p = str(d / f"arrival-{i}.parquet")
        _turns(ts).to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(d)


def test_watermark_emits_once_and_drops_post_eviction(spark, arrivals, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    windowed.run_windowed(
        spark, arrivals, out, ckpt,
        window_size="10 minutes", late_threshold="10 minutes",
        max_files_per_batch=1,
    )
    res = spark.read.parquet(out).toPandas()
    res["ws"] = res.window_start.dt.strftime("%H:%M")
    first = res[res.ws == "00:00"]
    # emitted exactly once with the on-time count; the post-eviction
    # arrival neither incremented it nor re-emitted the window
    assert len(first) == 1, res.to_string()
    assert int(first.n_turns.iloc[0]) == 3
    # open windows (00:30, 00:40) are not emitted
    assert set(res.ws) == {"00:00"}, res.to_string()


@pytest.fixture()
def dup_arrivals(tmp_path):
    """Batches exercising the dropDuplicatesWithinWatermark contract:

    - b0: (c0, 0) at 00:01 plus (c1, 0) at 00:02 — both first arrivals
    - b1: duplicate (c0, 0) re-sent at 00:03 — state alive → dropped
    - b2: (c2, 0) at 01:30 — the watermark (one-batch lag) becomes
          01:20 for b3
    - b3: (c3, 0) at 01:35 — a batch executed UNDER the 01:20 watermark,
          so (c0, 0)'s state (expiry 00:01 + 10 min = 00:11) is evicted
    - b4: duplicate (c0, 0) again at 01:40 — state evicted → RE-EMITTED
          (dedup is guaranteed within the watermark only)
    """
    d = tmp_path / "dupin"
    d.mkdir()

    def batch(rows):
        return pd.DataFrame(
            {
                "conv_id": [r[0] for r in rows],
                "turn_idx": pd.array([r[1] for r in rows], dtype="int32"),
                "role": "user",
                "text": "hello",
                "tool": "",
                "ts": pd.to_datetime([r[2] for r in rows]).astype(
                    "datetime64[us]"
                ),
            }
        )

    batches = [
        batch([("c0", 0, "2026-01-01 00:01:00"), ("c1", 0, "2026-01-01 00:02:00")]),
        batch([("c0", 0, "2026-01-01 00:03:00")]),
        batch([("c2", 0, "2026-01-01 01:30:00")]),
        batch([("c3", 0, "2026-01-01 01:35:00")]),
        batch([("c0", 0, "2026-01-01 01:40:00")]),
    ]
    for i, b in enumerate(batches):
        p = str(d / f"arrival-{i}.parquet")
        b.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(d)


def test_stream_dedup_within_watermark(spark, dup_arrivals, tmp_path):
    out, ckpt = str(tmp_path / "dout"), str(tmp_path / "dckpt")
    windowed.run_stream_dedup(
        spark, dup_arrivals, out, ckpt,
        late_threshold="10 minutes", max_files_per_batch=1,
    )
    res = spark.read.parquet(out).toPandas()
    counts = (
        res.groupby(["conv_id", "turn_idx"]).size().to_dict()
    )
    # in-watermark duplicate dropped; post-eviction duplicate re-emitted
    assert counts[("c0", 0)] == 2, res.to_string()
    assert counts[("c1", 0)] == 1
    assert counts[("c2", 0)] == 1
    assert counts[("c3", 0)] == 1
    assert len(res) == 5
