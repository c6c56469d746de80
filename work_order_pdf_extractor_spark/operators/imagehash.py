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


def _bmp24_batch_lumas(payloads: list):
    """Vectorized batch decode of uniform uncompressed 24-bit BMPs:
    returns an (n, h, w) int64 top-down luma array, or ``None`` when the
    batch is not uniformly fast-path decodable (mixed formats, mixed
    dims — the caller then uses the per-image codec path). The byte →
    luma arithmetic is the identical integer BT.601 formula, so the fast
    path is value-exact, not approximate."""
    import struct

    import numpy as np

    if not payloads:
        return None
    first = payloads[0]
    if len(first) < 54 or first[:2] != b"BM":
        return None
    header = first[:54]
    _, _size, _, _, offset = struct.unpack_from("<2sIHHI", first, 0)
    dib_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", first, 14
    )
    if dib_size < 40 or bpp != 24 or compression != 0:
        return None
    # uniformity: identical header bytes ⇒ identical geometry/offset
    n_bytes = len(first)
    for p in payloads:
        if len(p) != n_bytes or p[:54] != header:
            return None
    bottom_up = height > 0
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    if offset + h * stride > n_bytes:
        return None
    raw = np.frombuffer(
        b"".join(p[offset : offset + h * stride] for p in payloads),
        dtype=np.uint8,
    ).reshape(len(payloads), h, stride)
    pix = raw[:, :, : width * 3].reshape(len(payloads), h, width, 3)
    b_ = pix[..., 0].astype(np.int64)
    g_ = pix[..., 1].astype(np.int64)
    r_ = pix[..., 2].astype(np.int64)
    lum = (299 * r_ + 587 * g_ + 114 * b_) // 1000
    if bottom_up:
        lum = lum[:, ::-1, :]
    return lum


def _pack_bands(bits):
    """(n, 64) bool bit array → (n, 4) int32 16-bit bands (bit k goes to
    band k//16 at position k%16 — the same layout as the scalar path)."""
    import numpy as np

    weights = (1 << np.arange(16, dtype=np.int64))[None, None, :]
    return (
        (bits.reshape(-1, 4, 16).astype(np.int64) * weights)
        .sum(axis=2)
        .astype(np.int32)
    )


def _ahash_bands_batch(lum):
    """(n, h, w) lumas (dims divisible by 8) → (n, 4) int32 aHash bands;
    identical integer arithmetic to :func:`ahash_bands`."""
    import numpy as np

    n, h, w = lum.shape
    if h % 8 or w % 8:
        raise ValueError(f"ahash needs dims divisible by 8, got {w}x{h}")
    ch, cw = h // 8, w // 8
    sums = lum.reshape(n, 8, ch, 8, cw).sum(axis=(2, 4))  # (n, 8, 8)
    total = sums.sum(axis=(1, 2))
    bits = (sums.reshape(n, 64) * 64) > total[:, None]
    return _pack_bands(bits)


def _phash_bands_batch(lum):
    """(n, 16, 16) lumas → (n, 4) int32 pHash bands; the identical
    integer DCT (shared PHASH_BASIS), 8×8 low block, exact 63-AC-median
    threshold as :func:`phash_bands`, batched as one einsum."""
    import numpy as np

    n, h, w = lum.shape
    if (w, h) != (AHASH_SIDE, AHASH_SIDE):
        raise ValueError(
            f"phash expects a {AHASH_SIDE}x{AHASH_SIDE} raster, got {w}x{h}"
        )
    B = np.asarray(PHASH_BASIS, dtype=np.int64)
    C = np.einsum("uy,nyx,vx->nuv", B, lum, B)
    low = C[:, :8, :8].reshape(n, 64)
    med = np.partition(low[:, 1:], 31, axis=1)[:, 31]
    bits = low > med[:, None]
    return _pack_bands(bits)


def image_ahash(df: DataFrame) -> DataFrame:
    """media rows → (media_id, b0..b3) in one Arrow-batched pass: the
    payload bytes are consumed inside the scan stage and never shuffle —
    only four small ints per image leave it.

    r7: uniform 24-bit-BMP batches decode and hash vectorized (numpy
    byte-slicing + one reshape-sum per batch — guide §4.2) instead of a
    per-image pure-Python pixel loop; mixed batches fall back to the
    per-image codec path. Identical integer arithmetic either way
    (differential-tested)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = list(b["payload"])
            lum = _bmp24_batch_lumas(payloads)
            if lum is not None and lum.shape[1] % 8 == 0 and lum.shape[2] % 8 == 0:
                bands = _ahash_bands_batch(lum)
                yield pd.DataFrame(
                    {
                        "media_id": b["media_id"].values,
                        "b0": bands[:, 0],
                        "b1": bands[:, 1],
                        "b2": bands[:, 2],
                        "b3": bands[:, 3],
                    }
                )
                continue
            out = [ahash_bands(p) for p in payloads]
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
    """All pairs within ``max_hamming`` bits, via banded blocking over
    HASH CLASSES.

    Completeness: two 64-bit hashes within Hamming distance h < 4 differ
    in at most 3 of the 4 bands, so they collide exactly on at least one
    ``(band_idx, band_value)`` key — the banded equi-join finds EVERY
    qualifying pair (the oracle checks against an exhaustive cross-pair
    scan). ``max_hamming`` > 3 would break that guarantee and is refused.

    r7 shape: near-dup image corpora hold many images per DISTINCT hash,
    and the old per-image banded self-join materialized each surviving
    pair up to 4× (once per colliding band) plus every same-class pair,
    then paid a distinct over the whole pair set. Grouping to hash
    classes first (class id = min member id — unique because ids
    partition across classes) makes the banded join and the Hamming
    filter run on the (tiny) class table; member pairs are then expanded
    exactly once per qualifying class pair — identical pair set and
    hamming values, no distinct over O(pairs) rows, intermediate =
    output. Classes are split into ≤``chunk``-member sorted sub-arrays
    before expansion and the chunk-pair table is round-robin
    repartitioned, so one hot class (a popular hash) expands across many
    tasks instead of serializing the generate in one (guide §2.5)."""
    if max_hamming >= N_BANDS:
        raise ValueError(
            f"banded blocking with {N_BANDS} bands is only complete for "
            f"hamming < {N_BANDS}, got max_hamming={max_hamming}"
        )
    chunk = 512
    par = hashes.sparkSession.sparkContext.defaultParallelism
    cls = hashes.groupBy("b0", "b1", "b2", "b3").agg(
        F.min("media_id").alias("cid"),
        F.sort_array(F.collect_list("media_id")).alias("ids"),
    )
    # ≤chunk-member sorted slices; chunk k's members all precede chunk
    # k+1's (ids sorted), so cross-chunk expansion needs no d1<d2 filter
    cls_ch = (
        cls.select(
            "cid",
            "ids",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("ids") / chunk).cast("int") - 1,
                )
            ).alias("k"),
        )
        .select(
            "cid",
            "k",
            F.slice("ids", F.col("k") * chunk + 1, chunk).alias("sub"),
        )
    )
    bands_tbl = cls.select(
        "cid", F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band", "bv")
    )
    cp = (
        bands_tbl.alias("l")
        .join(
            bands_tbl.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.cid") < F.col("r.cid")),
        )
        .select(F.col("l.cid").alias("c1"), F.col("r.cid").alias("c2"))
        .distinct()
    )
    m1 = cls.select(
        F.col("cid").alias("c1"),
        *[F.col(b).alias(f"{b}_1") for b in ("b0", "b1", "b2", "b3")],
    )
    m2 = cls.select(
        F.col("cid").alias("c2"),
        *[F.col(b).alias(f"{b}_2") for b in ("b0", "b1", "b2", "b3")],
    )
    ham = (
        F.bit_count(F.expr("b0_1 ^ b0_2"))
        + F.bit_count(F.expr("b1_1 ^ b1_2"))
        + F.bit_count(F.expr("b2_1 ^ b2_2"))
        + F.bit_count(F.expr("b3_1 ^ b3_2"))
    ).cast("int")
    ch1 = cls_ch.select(F.col("cid").alias("c1"), F.col("sub").alias("sub1"))
    ch2 = cls_ch.select(F.col("cid").alias("c2"), F.col("sub").alias("sub2"))
    cross = (
        cp.join(F.broadcast(m1), "c1")
        .join(F.broadcast(m2), "c2")
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .join(F.broadcast(ch1), "c1")
        .join(F.broadcast(ch2), "c2")
        .repartition(par)
        .select(F.explode("sub1").alias("d1"), "sub2", "hamming")
        .select("d1", F.explode("sub2").alias("d2"), "hamming")
        .select(
            F.least("d1", "d2").alias("doc1"),
            F.greatest("d1", "d2").alias("doc2"),
            "hamming",
        )
    )
    # within-class chunk pairs generated ROW-LOCALLY from the class row
    # (k = k1·nch + k2 index arithmetic — no chunk self-join; same trick
    # as dedup._cooccurring_pairs)
    nch = F.ceil(F.size("ids") / chunk).cast("int")
    wpairs = (
        cls.filter(F.size("ids") > 1)
        .select(
            "ids",
            nch.alias("nch"),
            F.explode(F.sequence(F.lit(0), nch * nch - 1)).alias("kk"),
        )
        .select(
            "ids",
            F.expr("kk div nch").cast("int").alias("k1"),
            F.pmod(F.col("kk"), F.col("nch")).cast("int").alias("k2"),
        )
        .filter(F.col("k1") <= F.col("k2"))
        .select(
            F.col("k1"),
            F.col("k2"),
            F.slice("ids", F.col("k1") * chunk + 1, chunk).alias("sub1"),
            F.slice("ids", F.col("k2") * chunk + 1, chunk).alias("sub2"),
        )
        .repartition(par)
    )
    within_same = (
        wpairs.filter(F.col("k1") == F.col("k2"))
        .select(F.posexplode("sub1").alias("i", "d1"), "sub1")
        .select(
            "d1",
            F.explode(
                F.slice("sub1", F.col("i") + 2, F.size("sub1"))
            ).alias("d2"),
        )
    )
    within_cross = (
        wpairs.filter(F.col("k1") < F.col("k2"))
        .select(F.explode("sub1").alias("d1"), "sub2")
        .select("d1", F.explode("sub2").alias("d2"))
    )
    within = within_same.unionByName(within_cross).select(
        F.col("d1").alias("doc1"),
        F.col("d2").alias("doc2"),
        F.lit(0).cast("int").alias("hamming"),
    )
    return cross.unionByName(within)


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


_BMP16_HEADER: bytes | None = None


def _bmp16_header() -> bytes:
    """The 54 header bytes every 16×16 24-bit fixture BMP shares —
    sliced once from the scalar builder so the vectorized assembly is
    byte-identical to ``build_bmp`` by construction."""
    global _BMP16_HEADER
    if _BMP16_HEADER is None:
        _BMP16_HEADER = build_bmp(
            AHASH_SIDE, AHASH_SIDE, lambda x, y: (0, 0, 0)
        )[:54]
    return _BMP16_HEADER


def _gray_bmp16_payloads(v):
    """(n, 16, 16) int top-down gray values → list of BMP byte payloads
    (BGR bottom-up rows; 16·3 = 48 bytes/row needs no padding)."""
    import numpy as np

    hdr = _bmp16_header()
    data = np.repeat(
        v[:, ::-1, :, None].astype(np.uint8), 3, axis=3
    ).reshape(v.shape[0], AHASH_SIDE * AHASH_SIDE * 3)
    return [hdr + row.tobytes() for row in data]


def media_bmp16_from_documents(docs: DataFrame) -> DataFrame:
    """One deterministic 16×16 gray BMP per document (see
    :func:`_doc_ahash_pixel` for the near-dup group structure).

    r7: the raster batch is generated with vectorized numpy (the same
    closed-form pattern) and serialized through a shared header slice of
    the scalar ``build_bmp`` — payload bytes identical (tested), the
    per-pixel Python loop gone."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        xs = np.arange(AHASH_SIDE, dtype=np.int64)
        for b in batches:
            d = np.asarray(b["doc_id"].values, dtype=np.int64)
            gid = (d % 25)[:, None, None]
            v = (
                xs[None, None, :] * (3 + gid)
                + xs[None, :, None] * (5 + 2 * gid)
            ) % 256
            idx = np.arange(len(d))
            px, py = d % 16, (d // 16) % 16
            v[idx, py, px] = (v[idx, py, px] + 128) % 256
            payloads = _gray_bmp16_payloads(v)
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
    tests: EXACT invariance to unclamped global brightness shift — NOTE
    (ADVICE r6): the DC coefficient's bit (k = 0) IS included in the
    64-bit hash, but on non-negative rasters DC always exceeds the
    63-AC median, so bit 0 is pinned at 1 and a brightness shift (which
    moves only DC) cannot change any bit — and to exact contrast
    scaling (all coefficients and their median scale together)."""
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
    :func:`image_ahash` (payload bytes never leave the scan stage).

    r7: uniform 16×16 24-bit-BMP batches decode vectorized and run the
    integer DCT as one batched einsum; mixed batches fall back to the
    per-image path. Identical integers either way."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = list(b["payload"])
            lum = _bmp24_batch_lumas(payloads)
            if lum is not None and lum.shape[1:] == (AHASH_SIDE, AHASH_SIDE):
                bands = _phash_bands_batch(lum)
                yield pd.DataFrame(
                    {
                        "media_id": b["media_id"].values,
                        "b0": bands[:, 0],
                        "b1": bands[:, 1],
                        "b2": bands[:, 2],
                        "b3": bands[:, 3],
                    }
                )
                continue
            out = [phash_bands(p) for p in payloads]
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


def _phash_base_surface(gid: int):
    """(16, 16) int64 bilinear base surface for one pHash fixture group —
    the exact integer arithmetic of :func:`_doc_phash_pixel` without the
    per-doc shift/dipole, vectorized (25 groups total, cached)."""
    import numpy as np

    ctrl = np.asarray(_phash_control(gid), dtype=np.int64)  # [j][i]
    xs = np.arange(AHASH_SIDE, dtype=np.int64)
    i = np.minimum(xs // 5, 2)
    j = np.minimum(xs // 5, 2)
    fx = xs - 5 * i
    fy = xs - 5 * j
    # v[y, x] from the 4 surrounding control points
    c00 = ctrl[j[:, None], i[None, :]]
    c01 = ctrl[j[:, None], i[None, :] + 1]
    c10 = ctrl[j[:, None] + 1, i[None, :]]
    c11 = ctrl[j[:, None] + 1, i[None, :] + 1]
    return (
        c00 * (5 - fx[None, :]) * (5 - fy[:, None])
        + c01 * fx[None, :] * (5 - fy[:, None])
        + c10 * (5 - fx[None, :]) * fy[:, None]
        + c11 * fx[None, :] * fy[:, None]
    ) // 25


_PHASH_SURFACES: dict[int, object] = {}


def media_bmp16_smooth_from_documents(docs: DataFrame) -> DataFrame:
    """One deterministic smooth 16×16 gray BMP per document (see
    :func:`_doc_phash_pixel` for the group/shift/dipole structure).

    r7: vectorized — the 25 group base surfaces are computed once per
    task and the per-doc shift/dipole applied in numpy; byte-identical
    payloads (tested)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for g in range(_PHASH_GROUPS):
            if g not in _PHASH_SURFACES:
                _PHASH_SURFACES[g] = _phash_base_surface(g)
        bases = np.stack(
            [_PHASH_SURFACES[g] for g in range(_PHASH_GROUPS)]
        )  # (25, 16, 16)
        for b in batches:
            d = np.asarray(b["doc_id"].values, dtype=np.int64)
            gid = d % _PHASH_GROUPS
            shift = _PHASH_SHIFT_STEP * ((d // _PHASH_GROUPS) % 6)
            v = bases[gid] + shift[:, None, None]
            idx = np.arange(len(d))
            px, py = d % 15, (d // 16) % 16
            v[idx, py, px] += _PHASH_DIPOLE
            v[idx, py, px + 1] -= _PHASH_DIPOLE
            payloads = _gray_bmp16_payloads(v)
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
