"""Vectorized fast twins of the ANN search operators (r7 optimization).

Why a separate module (the ``ann_tuning`` precedent): editing
``operators/similarity.py`` would invalidate the attestation fingerprint
of its 33 dependent queries mid-window. The fast twins live here and the
handful of query wrappers that adopt them re-attest individually.

What is optimized, and why it is value-identical:

1. **Local top-k selection** — ``similarity._group_local_topk_fn`` (and
   its roles sibling in ``ann_tuning``) ran one full ``np.lexsort`` over
   the whole bucket PER QUERY ROW: O(m log m) per query in a Python
   loop, the measured hot spot of every grouped ANN scorer (guide §4.2:
   hand whole batches to vectorized native code). Here selection is one
   ``np.argpartition`` over a composite int64 key per query CHUNK.
   Exactness: the key ``(round(sim·10⁴) << 33) − id`` is a strictly
   monotone encoding of the global total order (round(sim,4) DESC, id
   ASC) whenever ``0 ≤ id < 2³³`` — distinct (sim, id) map to distinct
   keys because ids occupy disjoint low ranges per sim value — so the
   selected set and its order are IDENTICAL to the lexsort's. Ids
   outside that range fall back to the lexsort path.

2. **Hyperplane bucket bits** — the decimal(28,9) per-term fold of
   ``similarity._plane_projection`` is interpreted BigDecimal arithmetic
   (measured ~0.3 ms per row·8-plane set — it dominated every banded
   search). :func:`_proj_decimal_sums` reproduces the JVM decimal
   semantics EXACTLY in vectorized numpy: the per-term product is exact
   in float64 (24-bit float32 mantissa × 11-bit integer plane value ≤ 35
   bits < 53), the decimal(28,9) cast is HALF_UP rounding of the
   product's shortest-decimal representation (what Spark's
   ``Decimal.set(double)`` does via ``Double.toString``), and the fast
   path resolves it as ``rint(P·10⁹)`` with a guard band: any term
   within 10⁻³ of a .5 boundary (the f64 scaling error bound is ~10⁻⁴)
   is recomputed exactly with ``decimal.Decimal(repr(P))`` — bit-equal
   to the JVM for every non-pathological double (JDK17's Double.toString
   emits at most one digit beyond the shortest repr, a < 1-ulp decimal
   difference that cannot move a 10⁻⁹-granularity HALF_UP boundary
   except with probability ~10⁻¹⁷ per term). The per-plane sums are
   exact int64 sums of the per-term integers (|Σ| ≤ 64·10¹² < 2⁶³), so
   the sign — the bucket bit — is identical to the JVM/decimal/oracle
   value, not merely float-close.

3. **Query-restricted search** (``query_df``): the recall gauge consumes
   only rows with qid in its query set; the roles scorer computes
   queries×members sims instead of members², dropping the gauge's
   matmul+selection work by ~|corpus|/|queries|. Per-query results are
   unchanged (each query's local top-k is independent of other queries).

Differential tests: ``tests/test_annfast.py`` pins equality against the
``similarity``/``ann_tuning`` originals on the real sf embeddings and on
adversarial near-boundary rasters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import ivf_assign

_ID_LIMIT = 1 << 33
_PLANE_MUL = 2654435761


def _select_topk(ids, sims, take):
    """Per-row indices of the top-``take`` entries under (sim DESC, id
    ASC), vectorized. ``sims``: (q, m) float64 already rounded to 4dp;
    ``ids``: (m,) int64 within [0, 2^33). Returns (q, take) int indices."""
    import numpy as np

    key = (np.rint(sims * 10000.0).astype(np.int64) << 33) - ids[None, :]
    m = ids.shape[0]
    if take >= m:
        return np.argsort(-key, axis=1)
    part = np.argpartition(-key, take - 1, axis=1)[:, :take]
    sub = np.take_along_axis(key, part, axis=1)
    order = np.argsort(-sub, axis=1)
    return np.take_along_axis(part, order, axis=1)


def _select_bottomk(ids, vals, take):
    """Per-row indices of the bottom-``take`` entries under (val ASC, id
    ASC) — the L2 total order. Same key trick with signs flipped."""
    import numpy as np

    key = (np.rint(vals * 10000.0).astype(np.int64) << 33) + ids[None, :]
    m = ids.shape[0]
    if take >= m:
        return np.argsort(key, axis=1)
    part = np.argpartition(key, take - 1, axis=1)[:, :take]
    sub = np.take_along_axis(key, part, axis=1)
    order = np.argsort(sub, axis=1)
    return np.take_along_axis(part, order, axis=1)


def _ids_fast_ok(ids) -> bool:
    return len(ids) > 0 and int(ids.min()) >= 0 and int(ids.max()) < _ID_LIMIT


def group_local_topk_fn(k: int, id_col: str, vec_col: str):
    """Drop-in twin of ``similarity._group_local_topk_fn`` with
    vectorized selection (identical output — same 1024-row sim chunks,
    same np.round(.,4), same total order)."""
    import numpy as np
    import pandas as _pd

    def fn(pdf: "_pd.DataFrame") -> "_pd.DataFrame":
        ids = np.asarray(pdf[id_col].values, dtype=np.int64)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        m = len(ids)
        if m < 2:
            return _pd.DataFrame({"qid": [], "nid": [], "sim": []}).astype(
                {"qid": "int64", "nid": "int64", "sim": "float64"}
            )
        norms = np.sqrt((mat * mat).sum(axis=1))
        take = min(k + 1, m)
        fast = _ids_fast_ok(ids)
        out_q, out_n, out_s = [], [], []
        for lo in range(0, m, 1024):
            hi = min(lo + 1024, m)
            sims = np.round(
                (mat[lo:hi] @ mat.T) / (norms[lo:hi, None] * norms[None, :]), 4
            )
            if fast:
                idx = _select_topk(ids, sims, take)
                out_q.append(np.repeat(ids[lo:hi], take))
                out_n.append(ids[idx].ravel())
                out_s.append(np.take_along_axis(sims, idx, axis=1).ravel())
            else:  # ids outside the key range: original lexsort path
                for qi in range(hi - lo):
                    order = np.lexsort((ids, -sims[qi]))[:take]
                    out_q.append(np.full(take, ids[lo + qi]))
                    out_n.append(ids[order])
                    out_s.append(sims[qi][order])
        return _pd.DataFrame(
            {
                "qid": np.concatenate(out_q),
                "nid": np.concatenate(out_n),
                "sim": np.concatenate(out_s),
            }
        )

    return fn


def roles_topk_fn(k: int):
    """Twin of ``ann_tuning._cell_topk_roles_fn`` (corpus role 0 vs
    visiting-query role 1) with vectorized selection."""
    import numpy as np
    import pandas as _pd

    def fn(pdf: "_pd.DataFrame") -> "_pd.DataFrame":
        empty = _pd.DataFrame({"qid": [], "nid": [], "sim": []}).astype(
            {"qid": "int64", "nid": "int64", "sim": "float64"}
        )
        corpus = pdf[pdf["role"] == 0]
        queries = pdf[pdf["role"] == 1]
        if len(corpus) == 0 or len(queries) == 0:
            return empty
        cids = np.asarray(corpus["vid"].values, dtype=np.int64)
        cmat = np.array(list(corpus["vec"]), dtype=np.float64)
        qids = np.asarray(queries["vid"].values, dtype=np.int64)
        qmat = np.array(list(queries["vec"]), dtype=np.float64)
        cnorm = np.sqrt((cmat * cmat).sum(axis=1))
        qnorm = np.sqrt((qmat * qmat).sum(axis=1))
        take = min(k + 1, len(cids))
        fast = _ids_fast_ok(cids)
        out_q, out_n, out_s = [], [], []
        for lo in range(0, len(qids), 1024):
            hi = min(lo + 1024, len(qids))
            sims = np.round(
                (qmat[lo:hi] @ cmat.T) / (qnorm[lo:hi, None] * cnorm[None, :]),
                4,
            )
            if fast:
                idx = _select_topk(cids, sims, take)
                out_q.append(np.repeat(qids[lo:hi], take))
                out_n.append(cids[idx].ravel())
                out_s.append(np.take_along_axis(sims, idx, axis=1).ravel())
            else:
                for qi in range(hi - lo):
                    order = np.lexsort((cids, -sims[qi]))[:take]
                    out_q.append(np.full(take, qids[lo + qi]))
                    out_n.append(cids[order])
                    out_s.append(sims[qi][order])
        return _pd.DataFrame(
            {
                "qid": np.concatenate(out_q),
                "nid": np.concatenate(out_n),
                "sim": np.concatenate(out_s),
            }
        )

    return fn


# ---------------------------------------------------------------------------
# Exact decimal-semantics hyperplane buckets
# ---------------------------------------------------------------------------


def _planes_matrix(dims: int, n_planes: int):
    """(n_planes, dims) int64 plane values — the same deterministic
    integer family as ``similarity._plane_projection``."""
    import numpy as np

    d = np.arange(dims, dtype=np.int64)
    return np.stack(
        [(1 + (j * 64 + d) * _PLANE_MUL) % 2001 - 1000 for j in range(n_planes)],
        axis=0,
    )


def _proj_decimal_sums(mat, planes):
    """Exact decimal(28,9) projection sums, scaled by 10^9, as int64.

    ``mat``: (n, dims) float64 holding float32-exact embedding values.
    ``planes``: (p, dims) int64. Returns (n, p) int64 where entry equals
    the JVM's ``aggregate(... cast(x*plane as decimal(28,9)) ...)`` sum
    times 10^9 — see the module docstring for the exactness argument."""
    import numpy as np

    P = mat[:, None, :] * planes[None, :, :].astype(np.float64)
    y = P * 1e9
    D = np.rint(y).astype(np.int64)
    frac = y - np.floor(y)
    suspects = np.abs(frac - 0.5) < 1e-3
    if suspects.any():
        from decimal import ROUND_HALF_UP, Decimal

        q9 = Decimal("1.000000000")
        for n_i, j_i, d_i in np.argwhere(suspects):
            exact = Decimal(repr(P[n_i, j_i, d_i])).quantize(
                q9, rounding=ROUND_HALF_UP
            )
            D[n_i, j_i, d_i] = int(exact * 1_000_000_000)
    return D.sum(axis=2)


def banded_buckets_fast(
    df: DataFrame,
    bands: int = 4,
    planes_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact vectorized twin of ``similarity.banded_lsh_buckets``:
    identical (id, band, bucket) rows, one Arrow pass, no interpreted
    decimal folds. Row chunking bounds the (chunk × planes × dims)
    product tensor."""
    import numpy as np
    import pandas as _pd
    from collections.abc import Iterator as _It

    n_planes = bands * planes_per_band

    def fn(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        planes_cache: dict[int, "np.ndarray"] = {}
        for b in batches:
            if len(b) == 0:
                continue
            mat = np.array(list(b[vec_col]), dtype=np.float64)
            ids = np.asarray(b[id_col].values, dtype=np.int64)
            dims = mat.shape[1]
            if dims not in planes_cache:
                planes_cache[dims] = _planes_matrix(dims, n_planes)
            planes = planes_cache[dims]
            buckets = np.empty((len(ids), bands), dtype=np.int32)
            for lo in range(0, len(ids), 2048):
                hi = min(lo + 2048, len(ids))
                sums = _proj_decimal_sums(mat[lo:hi], planes)  # (c, planes)
                bits = (sums > 0).astype(np.int32)
                for band in range(bands):
                    seg = bits[:, band * planes_per_band : (band + 1) * planes_per_band]
                    buckets[lo:hi, band] = (
                        seg << np.arange(planes_per_band, dtype=np.int32)
                    ).sum(axis=1)
            yield _pd.DataFrame(
                {
                    id_col: np.repeat(ids, bands),
                    "band": np.tile(
                        np.arange(bands, dtype=np.int32), len(ids)
                    ),
                    "bucket": buckets.ravel(),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{id_col} long, band int, bucket int"
    )


def hyperplane_buckets_fast_exact(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact vectorized twin of ``similarity.hyperplane_lsh_buckets``
    (single table: bucket = Σ bit_j << j over all planes): identical
    (id, bucket:int) rows with the JVM decimal sign semantics."""
    import numpy as np
    import pandas as _pd
    from collections.abc import Iterator as _It

    def fn(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        planes_cache: dict[int, "np.ndarray"] = {}
        for b in batches:
            if len(b) == 0:
                continue
            mat = np.array(list(b[vec_col]), dtype=np.float64)
            ids = np.asarray(b[id_col].values, dtype=np.int64)
            dims = mat.shape[1]
            if dims not in planes_cache:
                planes_cache[dims] = _planes_matrix(dims, n_planes)
            planes = planes_cache[dims]
            out = np.empty(len(ids), dtype=np.int32)
            for lo in range(0, len(ids), 2048):
                hi = min(lo + 2048, len(ids))
                bits = (_proj_decimal_sums(mat[lo:hi], planes) > 0).astype(
                    np.int64
                )
                out[lo:hi] = (
                    bits << np.arange(n_planes, dtype=np.int64)
                ).sum(axis=1).astype(np.int32)
            yield _pd.DataFrame({id_col: ids, "bucket": out})

    return df.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{id_col} long, bucket int"
    )


# ---------------------------------------------------------------------------
# IVF assignment / probe twins
# ---------------------------------------------------------------------------


def _collect_centroids(centroids: DataFrame):
    """(cids int64 array, cmat float64 matrix) from the K-row model."""
    import numpy as np

    rows = centroids.select("centroid_id", "cv").collect()
    cids = np.array([r[0] for r in rows], dtype=np.int64)
    cmat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    return cids, cmat


def ivf_assign_fast(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized twin of ``similarity.ivf_assign`` for a MATERIALIZED
    model: one numpy matmul per Arrow batch against the K-row centroid
    matrix, argmax under (round(sim,4) DESC, centroid_id ASC) — the same
    winner as the JVM's ``max_by(struct(centroid_id, ...), struct(sim,
    -centroid_id))``. Output: (id_col, centroid_id, centroid_sim)."""
    import numpy as np
    import pandas as _pd
    from collections.abc import Iterator as _It

    cids, cmat = _collect_centroids(centroids)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    kpad = 1 << 16  # centroid ids are tiny; any bound > max(cid) works

    def fn(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for b in batches:
            if len(b) == 0:
                continue
            mat = np.array(list(b[vec_col]), dtype=np.float64)
            vnorm = np.sqrt((mat * mat).sum(axis=1))
            sims = np.round(
                (mat @ cmat.T) / (vnorm[:, None] * cnorm[None, :]), 4
            )
            key = (np.rint(sims * 10000.0).astype(np.int64) * kpad) + (
                kpad - 1 - cids[None, :]
            )
            win = np.argmax(key, axis=1)
            yield _pd.DataFrame(
                {
                    id_col: b[id_col].values,
                    "centroid_id": cids[win].astype(np.int32),
                    "centroid_sim": sims[np.arange(len(win)), win],
                }
            )

    out_schema = f"{id_col} long, centroid_id int, centroid_sim double"
    return df.select(id_col, vec_col).mapInPandas(fn, schema=out_schema)


def ivf_probe_cells_fast(
    df: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized twin of ``ann_tuning.ivf_probe_cells``: each vector's
    ``nprobe`` nearest centroids under (round(sim,4) DESC, centroid_id
    ASC). Output: (id_col, centroid_id, probe_rank)."""
    import numpy as np
    import pandas as _pd
    from collections.abc import Iterator as _It

    cids, cmat = _collect_centroids(centroids)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    kpad = 1 << 16
    take = min(nprobe, len(cids))

    def fn(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for b in batches:
            if len(b) == 0:
                continue
            mat = np.array(list(b[vec_col]), dtype=np.float64)
            vnorm = np.sqrt((mat * mat).sum(axis=1))
            sims = np.round(
                (mat @ cmat.T) / (vnorm[:, None] * cnorm[None, :]), 4
            )
            key = (np.rint(sims * 10000.0).astype(np.int64) * kpad) + (
                kpad - 1 - cids[None, :]
            )
            order = np.argsort(-key, axis=1)[:, :take]
            yield _pd.DataFrame(
                {
                    id_col: np.repeat(b[id_col].values, take),
                    "centroid_id": cids[order].ravel().astype(np.int32),
                    "probe_rank": np.tile(
                        np.arange(1, take + 1, dtype=np.int32), len(mat)
                    ),
                }
            )

    out_schema = f"{id_col} long, centroid_id int, probe_rank int"
    return df.select(id_col, vec_col).mapInPandas(fn, schema=out_schema)


# ---------------------------------------------------------------------------
# Search twins
# ---------------------------------------------------------------------------


def _finalize_topk(local: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        local.filter(F.col("qid") != F.col("nid"))
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "sim", "rank")
    )


def lsh_topk_banded_fast(
    df: DataFrame,
    k: int = 3,
    bands: int = 4,
    planes_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_df: DataFrame | None = None,
) -> DataFrame:
    """Twin of ``similarity.lsh_topk_banded``; with ``query_df`` the
    output is restricted to those qids (per-query rows identical)."""
    bb = banded_buckets_fast(df, bands, planes_per_band, id_col, vec_col)
    withv = df.select(id_col, vec_col).join(bb, id_col)
    if query_df is None:
        local = withv.groupBy("band", "bucket").applyInPandas(
            group_local_topk_fn(k, id_col, vec_col),
            schema="qid long, nid long, sim double",
        )
    else:
        corpus = withv.select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
            "band", "bucket", F.lit(0).alias("role"),
        )
        queries = withv.join(
            query_df.select(id_col), id_col, "left_semi"
        ).select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
            "band", "bucket", F.lit(1).alias("role"),
        )
        local = corpus.unionByName(queries).groupBy("band", "bucket").applyInPandas(
            roles_topk_fn(k), schema="qid long, nid long, sim double"
        )
    return _finalize_topk(local, k)


def lsh_topk_fast(
    df: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_df: DataFrame | None = None,
) -> DataFrame:
    """Twin of ``similarity.lsh_topk`` (single-table hyperplane LSH):
    within-bucket exact cosine top-k. The pair-materializing salted join
    + interpreted per-pair dot folds become one grouped matmul scorer —
    the same values (same bucket membership via the exact decimal bits,
    same round-4 sims, same total order), so results are identical; the
    salt de-skew is unnecessary here because per-bucket work is a single
    vectorized call, not |bucket|² exploded rows."""
    b = hyperplane_buckets_fast_exact(df, n_planes, id_col, vec_col)
    withv = df.select(id_col, vec_col).join(b, id_col)
    if query_df is None:
        local = withv.groupBy("bucket").applyInPandas(
            group_local_topk_fn(k, id_col, vec_col),
            schema="qid long, nid long, sim double",
        )
    else:
        corpus = withv.select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
            "bucket", F.lit(0).alias("role"),
        )
        queries = withv.join(
            query_df.select(id_col), id_col, "left_semi"
        ).select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
            "bucket", F.lit(1).alias("role"),
        )
        local = corpus.unionByName(queries).groupBy("bucket").applyInPandas(
            roles_topk_fn(k), schema="qid long, nid long, sim double"
        )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        local.filter(F.col("qid") != F.col("nid"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "sim", "rank")
    )


def ivf_topk_fast(
    df: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    query_df: DataFrame | None = None,
) -> DataFrame:
    """Twin of ``similarity.ivf_topk`` (within-cell cosine top-k over the
    rank-1 IVF assignment) with the vectorized scorer; ``query_df``
    restricts the emitted qids."""
    assign = (
        ivf_assign_fast(df, centroids, id_col, vec_col)
        if centroids is not None
        else ivf_assign(df, n_centroids, id_col, vec_col, centroids=None)
    )
    withc = df.select(id_col, vec_col).join(
        assign.select(id_col, "centroid_id"), id_col
    )
    if query_df is None:
        local = withc.groupBy("centroid_id").applyInPandas(
            group_local_topk_fn(k, id_col, vec_col),
            schema="qid long, nid long, sim double",
        )
    else:
        corpus = withc.select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
            "centroid_id", F.lit(0).alias("role"),
        )
        queries = withc.join(
            query_df.select(id_col), id_col, "left_semi"
        ).select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
            "centroid_id", F.lit(1).alias("role"),
        )
        local = corpus.unionByName(queries).groupBy("centroid_id").applyInPandas(
            roles_topk_fn(k), schema="qid long, nid long, sim double"
        )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        local.filter(F.col("qid") != F.col("nid"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "sim", "rank")
    )


def ivf_topk_nprobe_fast(
    df: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_df: DataFrame | None = None,
) -> DataFrame:
    """Twin of ``ann_tuning.ivf_topk_nprobe`` with the vectorized roles
    scorer; ``query_df`` restricts which vectors act as queries (their
    per-query results are unchanged — probe cells and within-cell ranks
    are query-local)."""
    if centroids is None:
        raise ValueError("pass the materialized trained model")
    corpus = (
        df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        .join(
            ivf_assign_fast(df, centroids, id_col, vec_col)
            .select(F.col(id_col).alias("vid"), "centroid_id"),
            "vid",
        )
        .withColumn("role", F.lit(0))
    )
    qsrc = df if query_df is None else df.join(
        query_df.select(id_col), id_col, "left_semi"
    )
    probes = (
        qsrc.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        .join(
            ivf_probe_cells_fast(qsrc, centroids, nprobe, id_col, vec_col)
            .select(F.col(id_col).alias("vid"), "centroid_id"),
            "vid",
        )
        .withColumn("role", F.lit(1))
    )
    cells = corpus.unionByName(probes)
    local = cells.groupBy("centroid_id").applyInPandas(
        roles_topk_fn(k), schema="qid long, nid long, sim double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        local.filter(F.col("qid") != F.col("nid"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "sim", "rank")
    )


def semdedup_fast(
    df: DataFrame,
    n_centroids: int,
    threshold: float,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Twin of ``similarity.semdedup`` for a materialized model: the
    interpreted JVM assignment fold becomes :func:`ivf_assign_fast`; the
    within-cell matmul scorer is unchanged (already vectorized)."""
    import numpy as np
    import pandas as _pd

    assign = ivf_assign_fast(df, centroids, id_col, vec_col).select(
        id_col, "centroid_id"
    )
    withv = assign.join(df.select(id_col, vec_col), id_col)

    def fn(pdf: "_pd.DataFrame") -> "_pd.DataFrame":
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        if len(ids) < 2:
            return _pd.DataFrame({id_col: ids[:0]})
        norms = np.sqrt((mat * mat).sum(axis=1))
        sims = np.round((mat @ mat.T) / (norms[:, None] * norms[None, :]), 4)
        hit = np.triu(sims >= threshold, k=1)
        return _pd.DataFrame({id_col: ids[hit.any(axis=0)]})

    dropped = withv.groupBy("centroid_id").applyInPandas(
        fn, schema=f"{id_col} long"
    )
    return assign.join(dropped, id_col, "left_anti").select(
        id_col, "centroid_id"
    )


def cosine_topk_fast2(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Twin of ``similarity.cosine_topk_fast`` with vectorized per-batch
    selection (same collected-query broadcast, same round-4 sims, same
    local-top-(k+1) contract)."""
    import numpy as np
    import pandas as _pd
    from collections.abc import Iterator as _It

    q_rows = query_df.select(id_col, vec_col).collect()
    if not q_rows:
        raise ValueError("cosine_topk_fast2 needs a non-empty query_df")
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    qn = np.sqrt((qm * qm).sum(axis=1))
    kk = k + 1

    def fn(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for b in batches:
            if len(b) == 0:
                continue
            mat = np.array(list(b[vec_col]), dtype=np.float64)
            nids = np.asarray(b[id_col].values, dtype=np.int64)
            nn = np.sqrt((mat * mat).sum(axis=1))
            sims = np.round((qm @ mat.T) / (qn[:, None] * nn[None, :]), 4)
            take = min(kk, sims.shape[1])
            if _ids_fast_ok(nids):
                idx = _select_topk(nids, sims, take)
                yield _pd.DataFrame(
                    {
                        "qid": np.repeat(qids, take),
                        "nid": nids[idx].ravel(),
                        "sim": np.take_along_axis(sims, idx, axis=1).ravel(),
                    }
                )
            else:
                out_q, out_n, out_s = [], [], []
                for qi in range(len(qids)):
                    order = np.lexsort((nids, -sims[qi]))[:take]
                    out_q.append(np.full(take, qids[qi]))
                    out_n.append(nids[order])
                    out_s.append(sims[qi][order])
                yield _pd.DataFrame(
                    {
                        "qid": np.concatenate(out_q),
                        "nid": np.concatenate(out_n),
                        "sim": np.concatenate(out_s),
                    }
                )

    cand = df.select(id_col, vec_col).mapInPandas(
        fn, schema="qid long, nid long, sim double"
    ).filter(F.col("qid") != F.col("nid"))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "sim", "rank")
    )


def l2_topk_fast(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized twin of ``similarity.l2_topk`` for a bounded query set
    (the recall gauge's exact-L2 ground truth): per batch one matmul
    computing ``round(q·q − 2·q·n + n·n, 4)``, local bottom-(k+1) under
    (d2 ASC, nid ASC) — the same local-cut-contains-global argument as
    ``cosine_topk_fast``. Output: (qid, nid, d2, rank)."""
    import numpy as np
    import pandas as _pd
    from collections.abc import Iterator as _It

    q_rows = query_df.select(id_col, vec_col).collect()
    if not q_rows:
        raise ValueError("l2_topk_fast needs a non-empty query_df")
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    qq = (qm * qm).sum(axis=1)
    kk = k + 1

    def fn(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for b in batches:
            if len(b) == 0:
                continue
            mat = np.array(list(b[vec_col]), dtype=np.float64)
            nids = np.asarray(b[id_col].values, dtype=np.int64)
            nn = (mat * mat).sum(axis=1)
            d2 = np.round(
                qq[:, None] - 2.0 * (qm @ mat.T) + nn[None, :], 4
            )
            take = min(kk, d2.shape[1])
            if _ids_fast_ok(nids):
                idx = _select_bottomk(nids, d2, take)
                yield _pd.DataFrame(
                    {
                        "qid": np.repeat(qids, take),
                        "nid": nids[idx].ravel(),
                        "d2": np.take_along_axis(d2, idx, axis=1).ravel(),
                    }
                )
            else:
                out_q, out_n, out_s = [], [], []
                for qi in range(len(qids)):
                    order = np.lexsort((nids, d2[qi]))[:take]
                    out_q.append(np.full(take, qids[qi]))
                    out_n.append(nids[order])
                    out_s.append(d2[qi][order])
                yield _pd.DataFrame(
                    {
                        "qid": np.concatenate(out_q),
                        "nid": np.concatenate(out_n),
                        "d2": np.concatenate(out_s),
                    }
                )

    cand = df.select(id_col, vec_col).mapInPandas(
        fn, schema="qid long, nid long, d2 double"
    ).filter(F.col("qid") != F.col("nid"))
    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "d2", "rank")
    )
