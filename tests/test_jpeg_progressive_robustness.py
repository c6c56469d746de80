"""Corrupt-stream behavior of the progressive decoder.

A bad payload must become a clean exception (which image_features turns
into a status='decode_failed' row), never a hang, a wrong answer, or an
unbounded loop — the same degradation contract as every other codec in
the engine.
"""

import pytest

from work_order_pdf_extractor_spark.core import jpegcodec as J


def _prog():
    return J.encode_progressive_gray(16, 16, list(range(256)))


def test_truncated_streams_raise():
    p = _prog()
    for cut in (len(p) // 4, len(p) // 2, len(p) - 3):
        with pytest.raises((ValueError, IndexError, NotImplementedError)):
            J.decode_progressive(p[:cut])


def test_flipped_entropy_bytes_never_hang():
    # flipping bytes inside scan data either still decodes (different
    # pixels) or raises — both acceptable; what must not happen is a
    # hang or a non-exception crash
    p = bytearray(_prog())
    sos = p.find(b"\xff\xda")
    for off in (sos + 20, sos + 25, len(p) - 10):
        q = bytearray(p)
        q[off] ^= 0x5A
        try:
            J.decode_progressive(bytes(q))
        except (ValueError, IndexError, KeyError, NotImplementedError):
            pass


def test_missing_sof_raises():
    p = bytearray(_prog())
    i = p.find(b"\xff\xc2")
    p[i + 1] = 0xC3  # lossless SOF: out of subset
    with pytest.raises(NotImplementedError):
        J.decode_progressive(bytes(p))


def test_scan_before_frame_raises():
    # strip the SOF2 segment entirely: SOS then arrives before any frame
    p = _prog()
    i = p.find(b"\xff\xc2")
    import struct

    (seglen,) = struct.unpack_from(">H", p, i + 2)
    stripped = p[:i] + p[i + 2 + seglen :]
    with pytest.raises(ValueError):
        J.decode_progressive(stripped)


def test_decode_failed_rows_not_task_failures(spark):
    # end-to-end: a corrupt progressive payload flows through
    # image_features as a status row, exactly like other codecs
    import pandas as pd

    from work_order_pdf_extractor_spark.operators import multimodal

    good = _prog()
    bad = good[: len(good) // 2]
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": pd.array([1, 2], dtype="int64"),
                "kind": ["image", "image"],
                "payload": [good, bad],
                "mime": ["image/jpeg"] * 2,
                "n_bytes": pd.array([len(good), len(bad)], dtype="int32"),
            }
        )
    )
    rows = {r.media_id: r.status for r in multimodal.image_features(media).collect()}
    assert rows[1] == "ok"
    assert rows[2] == "decode_failed"
