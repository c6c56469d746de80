"""Multimodal plumbing: binary payload schema, Arrow batch path, stubbed
decode with deterministic fake, frame-sample fan-out."""

from __future__ import annotations

import pytest

from work_order_pdf_extractor_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media_df(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return M.media_from_documents(docs)


def test_media_schema(media_df):
    assert [f.name for f in media_df.schema.fields] == [
        "media_id", "kind", "payload", "mime", "n_bytes",
    ]
    assert media_df.schema["payload"].dataType.typeName() == "binary"


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"bytes", fake=False)


def test_fake_decode_deterministic():
    a = M.decode_image(b"same bytes", fake=True)
    b = M.decode_image(b"same bytes", fake=True)
    assert a == b
    assert len(a["embedding"]) == 16


def test_image_features_distributed_match_local(spark, media_df):
    feats = M.image_features(media_df, fake=True).toPandas()
    rows = media_df.select("media_id", "payload").toPandas()
    assert len(feats) == len(rows)
    local = {
        int(r.media_id): M.decode_image(bytes(r.payload), fake=True)
        for r in rows.itertuples()
    }
    for r in feats.itertuples():
        exp = local[int(r.media_id)]
        assert r.sha256 == exp["sha256"]
        assert (r.width, r.height) == (exp["width"], exp["height"])
        assert list(r.embedding) == pytest.approx(exp["embedding"], abs=1e-6)


def test_payload_dropped_from_features(spark, media_df):
    feats = M.image_features(media_df, fake=True)
    assert "payload" not in feats.columns


def test_frame_sample_plan(spark, media_df):
    plan = M.frame_sample_plan(media_df, every_n=10).toPandas()
    one = plan[plan.media_id == plan.media_id.iloc[0]]
    assert (one.frame_no.values % 10 == 0).all()
    assert one.frame_no.is_monotonic_increasing
