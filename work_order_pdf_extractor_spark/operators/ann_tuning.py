"""ANN recall-tuning operators that compose the frozen similarity core.

This module exists so tuning levers can land WITHOUT touching
``operators/similarity.py`` mid-attestation-window (editing that module
would invalidate the fingerprints of the whole IVF/PQ/cosine query
family while they wait for re-attestation; see ATTESTATION.json). It
imports the trained-model/assignment machinery and adds the remaining
lever the r4 verdict named: IVF search with ``nprobe > 1``.

Reference analog: the reference has no ANN at all — this is part of the
training-data-pipeline surface the north rule adds on top
(``work_order_extractor.py`` has no counterpart; SURVEY §2 addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .similarity import _dot, _norm, ivf_assign


def ivf_probe_cells(
    df: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Each vector's ``nprobe`` nearest centroids (rounded cosine,
    centroid-id tiebreak — the same total order as :func:`ivf_assign`,
    which this generalizes from rank 1 to rank ≤ nprobe). Output:
    ``(id_col, centroid_id, probe_rank)``. The scoring join is a
    broadcast against the K-row model — O(rows × K)."""
    v = df.select(id_col, F.col(vec_col).alias("vv"))
    sim = F.round(_dot("vv", "cv") / (_norm("vv") * _norm("cv")), 4)
    scored = v.join(F.broadcast(centroids)).select(
        id_col, "centroid_id", sim.alias("centroid_sim")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("centroid_sim").desc(), F.col("centroid_id")
    )
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .select(id_col, "centroid_id", "probe_rank")
    )


def _cell_topk_roles_fn(k: int):
    """applyInPandas scorer for one IVF cell with ROLES: corpus members
    (role 0) vs visiting queries (role 1, replicated into each probed
    cell). Computes the query×corpus cosine block with chunked numpy
    matmuls and emits each query's local top-(k+1) under the global
    total order (round(sim,4) DESC, nid ASC) — the same
    local-cut-contains-global-top-k argument as the banded-LSH scorer,
    since a corpus vector lives in exactly one cell."""
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
        take = min(k + 1, len(cids))  # +1: self-match removed downstream
        out_q, out_n, out_s = [], [], []
        for lo in range(0, len(qids), 1024):
            hi = min(lo + 1024, len(qids))
            sims = np.round(
                (qmat[lo:hi] @ cmat.T)
                / (qnorm[lo:hi, None] * cnorm[None, :]),
                4,
            )
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


def ivf_topk_nprobe(
    df: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k with MULTI-CELL probing: the corpus stays
    partitioned into its rank-1 cells (one cell per vector —
    :func:`ivf_assign`), but each query searches its ``nprobe`` nearest
    cells. ``nprobe=1`` reproduces ``similarity.ivf_topk`` exactly;
    raising it is the standard IVF recall lever (a true neighbor lost to
    a cell boundary is found while per-query work stays
    ``nprobe × N/K`` — never the full scan). Output:
    ``(qid, nid, sim, rank)``.

    Plan shape at scale: model broadcast (K rows) → one probe window per
    query (O(rows × K) scored rows, top-nprobe kept) → the query side
    replicates ``nprobe``-fold into cell groups; per-cell scoring is one
    chunked numpy matmul emitting only local top-(k+1) rows; the final
    window sees O(queries × nprobe × k) candidate rows. A corpus vector
    belongs to exactly one cell, so no (q, n) pair is scored twice and
    no distinct is needed."""
    if centroids is None:
        raise ValueError(
            "pass the materialized trained model (similarity.ivf_centroids"
            " output collected to a local relation); training inside the"
            " search plan re-runs Lloyd per query"
        )
    corpus = (
        df.select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
        )
        .join(
            ivf_assign(df, id_col=id_col, vec_col=vec_col, centroids=centroids)
            .select(F.col(id_col).alias("vid"), "centroid_id"),
            "vid",
        )
        .withColumn("role", F.lit(0))
    )
    probes = (
        df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        .join(
            ivf_probe_cells(df, centroids, nprobe, id_col, vec_col).select(
                F.col(id_col).alias("vid"), "centroid_id"
            ),
            "vid",
        )
        .withColumn("role", F.lit(1))
    )
    cells = corpus.unionByName(probes)
    local = cells.groupBy("centroid_id").applyInPandas(
        _cell_topk_roles_fn(k), schema="qid long, nid long, sim double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        local.filter(F.col("qid") != F.col("nid"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "sim", "rank")
    )
