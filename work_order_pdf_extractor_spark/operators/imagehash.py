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
