"""Perceptual-hash image near-duplicate detection (average hash).

The multimodal twin of the text near-dup family: crawled corpora carry
re-encoded / slightly-retouched copies of the same image, and byte-level
sha256 dedup misses all of them. The standard cheap answer is a
perceptual hash — here the classic 8×8 AVERAGE HASH (aHash): decode the
raster (through the same real stdlib codecs as
:mod:`.multimodal`), pool to an 8×8 grid of integer cell sums, and set
bit k when cell k's mean exceeds the global mean. Near-duplicates are
pairs within a small Hamming distance.

Cross-engine exactness: every step is integer arithmetic —
``cell_sum * 64 > total_sum`` replaces the float mean comparison, and
the 64-bit hash is stored as four 16-bit band integers (0..65535), which
sidesteps signed-long edge cases AND is exactly the blocking key the
pair join needs.

Scale shape (100 TB of images): hashing is one narrow Arrow pass over
the payload column (bytes never shuffle — only four small ints per image
leave the scan stage). The pair search NEVER goes quadratic: by the
pigeonhole principle, two hashes within Hamming distance ``h < 4`` agree
exactly on at least one of the 4 bands, so an equi-join on
``(band_idx, band_value)`` is a COMPLETE blocking scheme for h ≤ 3 —
the same OR-construction discipline as ``simhash_near_pairs`` and the
banded MinHash-LSH, with per-bucket population bounded by how many
images genuinely share a band.

Reference analog: the reference pipeline has no image dedup at all — it
trusts filename uniqueness (work_order_extractor.py:1769-1797); this is
the stage a corpus-scale crawl needs instead.
"""

from __future__ import annotations

import math

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .common import ensure_parallelism
from .multimodal import (
    MEDIA_SCHEMA,
    _decode_bmp,
    _decode_png,
    _decode_ppm,
    build_bmp,
)

AHASH_SIDE = 16  # fixture raster side → 2×2 px per 8×8-grid cell
N_BANDS = 4  # 64 bits / 16 bits per band; complete for hamming <= 3


def ahash_bands(payload: bytes) -> tuple[int, int, int, int]:
    """Decode a BMP/PNG/PPM payload and return the 64-bit average hash
    as four 16-bit band integers (band j holds bits 16j..16j+15, bit
    k = cy*8+cx set when cell (cx, cy)'s sum * 64 > the raster total).

    Requires dimensions divisible by 8 so the pooling grid is exact
    (integer cell sums — no fractional-cell float averaging)."""
    if payload[:2] == b"BM":
        w, h, lumas = _decode_bmp(payload)
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, lumas = _decode_png(payload)
    elif payload[:2] == b"P6":
        w, h, lumas = _decode_ppm(payload)
    else:
        raise ValueError("unsupported payload for ahash")
    if w % 8 or h % 8:
        raise ValueError(f"ahash needs dims divisible by 8, got {w}x{h}")
    cw, ch = w // 8, h // 8
    sums = [0] * 64
    for y in range(h):
        row_cell = (y // ch) * 8
        base = y * w
        for x in range(w):
            sums[row_cell + x // cw] += lumas[base + x]
    total = sum(sums)
    bands = [0, 0, 0, 0]
    for k, s in enumerate(sums):
        if s * 64 > total:
            bands[k // 16] |= 1 << (k % 16)
    return bands[0], bands[1], bands[2], bands[3]


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("b0", T.IntegerType()),
        T.StructField("b1", T.IntegerType()),
        T.StructField("b2", T.IntegerType()),
        T.StructField("b3", T.IntegerType()),
    ]
)


def image_ahash(df: DataFrame) -> DataFrame:
    """media rows → (media_id, b0..b3) in one Arrow-batched pass: the
    payload bytes are consumed inside the scan stage and never shuffle —
    only four small ints per image leave it."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = [ahash_bands(p) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].values,
                    "b0": pd.array([o[0] for o in out], dtype="int32"),
                    "b1": pd.array([o[1] for o in out], dtype="int32"),
                    "b2": pd.array([o[2] for o in out], dtype="int32"),
                    "b3": pd.array([o[3] for o in out], dtype="int32"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(fn, schema=AHASH_SCHEMA)


def ahash_near_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """All pairs within ``max_hamming`` bits, via banded blocking.

    Completeness: two 64-bit hashes within Hamming distance h < 4 differ
    in at most 3 of the 4 bands, so they collide exactly on at least one
    ``(band_idx, band_value)`` key — the equi-join below therefore finds
    EVERY qualifying pair (the oracle checks against an exhaustive
    cross-pair scan). ``max_hamming`` > 3 would break that guarantee and
    is refused."""
    if max_hamming >= N_BANDS:
        raise ValueError(
            f"banded blocking with {N_BANDS} bands is only complete for "
            f"hamming < {N_BANDS}, got max_hamming={max_hamming}"
        )
    exploded = hashes.select(
        "media_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band", "bv"),
    )
    left = exploded.alias("l")
    right = exploded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .select(
            F.col("l.media_id").alias("doc1"),
            F.col("r.media_id").alias("doc2"),
            (
                F.bit_count(F.expr("l.b0 ^ r.b0"))
                + F.bit_count(F.expr("l.b1 ^ r.b1"))
                + F.bit_count(F.expr("l.b2 ^ r.b2"))
                + F.bit_count(F.expr("l.b3 ^ r.b3"))
            )
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def _doc_ahash_pixel(doc_id: int):
    """Deterministic 16×16 gray fixture with NEAR-DUP STRUCTURE: docs
    sharing ``doc_id % 25`` have the same base linear pattern and differ
    only in one perturbed pixel each, so same-group pairs land within a
    few hash bits while different groups (different gradient
    orientation) land far apart. Gray (v,v,v) keeps luma == v exactly,
    so the DuckDB oracle regenerates the raster in closed form."""
    gid = doc_id % 25
    px_x, px_y = doc_id % 16, (doc_id // 16) % 16

    def px(x: int, y: int) -> tuple[int, int, int]:
        v = (x * (3 + gid) + y * (5 + 2 * gid)) % 256
        if x == px_x and y == px_y:
            v = (v + 128) % 256
        return (v, v, v)

    return px


def media_bmp16_from_documents(docs: DataFrame) -> DataFrame:
    """One deterministic 16×16 gray BMP per document (see
    :func:`_doc_ahash_pixel` for the near-dup group structure)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = [
                build_bmp(AHASH_SIDE, AHASH_SIDE, _doc_ahash_pixel(int(d)))
                for d in b["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["doc_id"].values,
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/bmp",
                    "n_bytes": pd.array(
                        [len(p) for p in payloads], dtype="int32"
                    ),
                }
            )

    return ensure_parallelism(docs.select("doc_id")).mapInPandas(
        fn, schema=MEDIA_SCHEMA
    )

# ===========================================================================
# DCT perceptual hash (pHash) — r6
# ===========================================================================

# Integer 16-point DCT-II basis, round(2^14 · cos(π(2x+1)u/32)). Computed
# once at import from math.cos and shared VERBATIM with the DuckDB oracle
# (queries.py embeds these integers into the SQL via f-string), so both
# engines run the identical integer transform. Rounding is tie-safe: the
# nearest any scaled basis value comes to an exact .5 boundary is 0.0105
# (measured), ~1e13 ulps — no platform's cos() can cross it.
PHASH_SCALE = 1 << 14
PHASH_BASIS: list[list[int]] = [
    [
        round(PHASH_SCALE * math.cos(math.pi * (2 * x + 1) * u / 32))
        for x in range(AHASH_SIDE)
    ]
    for u in range(AHASH_SIDE)
]


def phash_bands(payload: bytes) -> tuple[int, int, int, int]:
    """Decode a BMP/PNG/PPM payload and return the 64-bit DCT perceptual
    hash as four 16-bit band integers.

    The classic pHash recipe (Zauner, "Implementation and Benchmarking
    of Perceptual Image Hash Functions") made integer-exact: 16×16 luma
    raster → integer 2-D DCT-II (``C[u,v] = Σ_y Σ_x B[u,y]·B[v,x]·L[y,x]``
    with the shared ``PHASH_BASIS``; |C| < 2^45, no overflow) → keep the
    8×8 LOW-FREQUENCY block → threshold each coefficient against the
    MEDIAN of the 63 AC coefficients (the 32nd order statistic of an
    odd-sized integer multiset — exactly reproducible, no float mean) →
    bit ``k = u*8+v`` set when ``C[u,v] > median``. Properties pinned by
    tests: EXACT invariance to unclamped global brightness shift (only
    the excluded DC coefficient changes) and to exact contrast scaling
    (all coefficients and their median scale together)."""
    if payload[:2] == b"BM":
        w, h, lumas = _decode_bmp(payload)
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, lumas = _decode_png(payload)
    elif payload[:2] == b"P6":
        w, h, lumas = _decode_ppm(payload)
    else:
        raise ValueError("unsupported payload for phash")
    if (w, h) != (AHASH_SIDE, AHASH_SIDE):
        raise ValueError(
            f"phash expects a {AHASH_SIDE}x{AHASH_SIDE} raster, got {w}x{h}"
        )
    import numpy as np

    L = np.asarray(lumas, dtype=np.int64).reshape(AHASH_SIDE, AHASH_SIDE)
    B = np.asarray(PHASH_BASIS, dtype=np.int64)
    C = B @ L @ B.T
    low = C[:8, :8].ravel()
    med = int(np.partition(low[1:], 31)[31])
    bands = [0, 0, 0, 0]
    for k in range(64):
        if int(low[k]) > med:
            bands[k // 16] |= 1 << (k % 16)
    return bands[0], bands[1], bands[2], bands[3]


def image_phash(df: DataFrame) -> DataFrame:
    """media rows → (media_id, b0..b3) DCT perceptual hash, one
    Arrow-batched pass; same narrow-output discipline as
    :func:`image_ahash` (payload bytes never leave the scan stage)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = [phash_bands(p) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].values,
                    "b0": pd.array([o[0] for o in out], dtype="int32"),
                    "b1": pd.array([o[1] for o in out], dtype="int32"),
                    "b2": pd.array([o[2] for o in out], dtype="int32"),
                    "b3": pd.array([o[3] for o in out], dtype="int32"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(fn, schema=AHASH_SCHEMA)


# pHash fixture: md5-seeded SMOOTH rasters (bilinear interpolation of a
# 4×4 control grid) — a DCT hash is only meaningful on images with
# low-frequency structure; the aHash fixture's mod-256 sawtooth is
# spectrally white and would make every coefficient marginal.
_PHASH_CTRL_RANGE = 200
_PHASH_CTRL_LO = 28
_PHASH_GROUPS = 25
_PHASH_SHIFT_STEP = 3  # brightness variants 0..15 — never clamps
_PHASH_DIPOLE = 6


def _md5_int32(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _phash_control(gid: int) -> list[list[int]]:
    return [
        [
            _md5_int32(f"{gid}:{i}:{j}") % _PHASH_CTRL_RANGE + _PHASH_CTRL_LO
            for i in range(4)
        ]
        for j in range(4)
    ]


def _doc_phash_pixel(doc_id: int):
    """Deterministic smooth 16×16 gray fixture with near-dup structure:
    docs sharing ``doc_id % 25`` share a bilinear base surface; variants
    differ by an UNCLAMPED global brightness shift (pHash-invariant by
    construction — only DC moves) plus a tiny ±6 horizontal dipole
    (high-frequency, so its low-block leakage exercises the Hamming
    threshold non-trivially). Values stay within [21, 248] by
    construction: no clamping, so the DuckDB oracle regenerates every
    pixel in closed form."""
    gid = doc_id % _PHASH_GROUPS
    ctrl = _phash_control(gid)
    shift = _PHASH_SHIFT_STEP * ((doc_id // _PHASH_GROUPS) % 6)
    px, py = doc_id % 15, (doc_id // 16) % 16

    def px_fn(x: int, y: int) -> tuple[int, int, int]:
        i = min(x // 5, 2)
        j = min(y // 5, 2)
        fx, fy = x - 5 * i, y - 5 * j
        v = (
            ctrl[j][i] * (5 - fx) * (5 - fy)
            + ctrl[j][i + 1] * fx * (5 - fy)
            + ctrl[j + 1][i] * (5 - fx) * fy
            + ctrl[j + 1][i + 1] * fx * fy
        ) // 25
        v += shift
        if y == py and x == px:
            v += _PHASH_DIPOLE
        elif y == py and x == px + 1:
            v -= _PHASH_DIPOLE
        return (v, v, v)

    return px_fn


def media_bmp16_smooth_from_documents(docs: DataFrame) -> DataFrame:
    """One deterministic smooth 16×16 gray BMP per document (see
    :func:`_doc_phash_pixel` for the group/shift/dipole structure)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = [
                build_bmp(AHASH_SIDE, AHASH_SIDE, _doc_phash_pixel(int(d)))
                for d in b["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["doc_id"].values,
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/bmp",
                    "n_bytes": pd.array(
                        [len(p) for p in payloads], dtype="int32"
                    ),
                }
            )

    return ensure_parallelism(docs.select("doc_id")).mapInPandas(
        fn, schema=MEDIA_SCHEMA
    )
