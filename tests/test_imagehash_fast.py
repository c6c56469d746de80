"""Differential tests for the r7 vectorized imagehash paths: batch BMP
decode + batched hash arithmetic vs the scalar per-image originals, and
byte-identity of the vectorized fixture builders vs ``build_bmp``."""

from __future__ import annotations

import numpy as np
import pandas as pd

from work_order_pdf_extractor_spark.operators import imagehash as ih
from work_order_pdf_extractor_spark.operators.multimodal import build_bmp

DOC_IDS = list(range(0, 120)) + [399, 400, 401, 1234, 99999, 10_000_007]


def test_ahash_fixture_payloads_byte_identical():
    d = np.array(DOC_IDS, dtype=np.int64)
    gid = (d % 25)[:, None, None]
    xs = np.arange(16, dtype=np.int64)
    v = (xs[None, None, :] * (3 + gid) + xs[None, :, None] * (5 + 2 * gid)) % 256
    idx = np.arange(len(d))
    px, py = d % 16, (d // 16) % 16
    v[idx, py, px] = (v[idx, py, px] + 128) % 256
    fast = ih._gray_bmp16_payloads(v)
    for k, doc in enumerate(DOC_IDS):
        slow = build_bmp(16, 16, ih._doc_ahash_pixel(doc))
        assert fast[k] == slow, f"payload mismatch doc_id={doc}"


def test_phash_fixture_payloads_byte_identical():
    d = np.array(DOC_IDS, dtype=np.int64)
    bases = np.stack([ih._phash_base_surface(g) for g in range(25)])
    gid = d % 25
    shift = ih._PHASH_SHIFT_STEP * ((d // 25) % 6)
    v = bases[gid] + shift[:, None, None]
    idx = np.arange(len(d))
    px, py = d % 15, (d // 16) % 16
    v[idx, py, px] += ih._PHASH_DIPOLE
    v[idx, py, px + 1] -= ih._PHASH_DIPOLE
    fast = ih._gray_bmp16_payloads(v)
    for k, doc in enumerate(DOC_IDS):
        slow = build_bmp(16, 16, ih._doc_phash_pixel(doc))
        assert fast[k] == slow, f"payload mismatch doc_id={doc}"


def test_batch_hashes_match_scalar():
    payloads = [
        build_bmp(16, 16, ih._doc_ahash_pixel(doc)) for doc in DOC_IDS
    ] + [build_bmp(16, 16, ih._doc_phash_pixel(doc)) for doc in DOC_IDS]
    lum = ih._bmp24_batch_lumas(payloads)
    assert lum is not None
    a_fast = ih._ahash_bands_batch(lum)
    p_fast = ih._phash_bands_batch(lum)
    for k, p in enumerate(payloads):
        assert tuple(a_fast[k]) == ih.ahash_bands(p)
        assert tuple(p_fast[k]) == ih.phash_bands(p)


def test_batch_lumas_rejects_mixed_batches():
    p16 = build_bmp(16, 16, ih._doc_ahash_pixel(3))
    p24 = build_bmp(24, 24, lambda x, y: (x % 256, x % 256, x % 256))
    assert ih._bmp24_batch_lumas([p16, p24]) is None
    assert ih._bmp24_batch_lumas([b"P6 not a bmp"]) is None
    assert ih._bmp24_batch_lumas([]) is None


def test_image_hash_spark_paths_match_scalar(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": DOC_IDS}), "doc_id long"
    )
    media = ih.media_bmp16_from_documents(docs)
    rows = {
        r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in ih.image_ahash(media).collect()
    }
    for doc in DOC_IDS:
        slow = ih.ahash_bands(build_bmp(16, 16, ih._doc_ahash_pixel(doc)))
        assert rows[doc] == slow
    media_s = ih.media_bmp16_smooth_from_documents(docs)
    rows = {
        r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in ih.image_phash(media_s).collect()
    }
    for doc in DOC_IDS:
        slow = ih.phash_bands(build_bmp(16, 16, ih._doc_phash_pixel(doc)))
        assert rows[doc] == slow
