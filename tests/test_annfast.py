"""Differential tests: operators/annfast.py fast twins vs the
similarity/ann_tuning originals — exact frame equality on the real sf
embeddings plus adversarial unit checks on the selection kernel and the
decimal projection semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from work_order_pdf_extractor_spark.operators import (
    ann_tuning,
    annfast,
    similarity,
)

SF = "/root/testdata/sf0.01"


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def cents(spark, emb):
    trained = similarity.ivf_centroids(emb, 8, 2)
    return spark.createDataFrame(trained.collect(), trained.schema)


def test_select_topk_matches_lexsort_with_ties():
    rng = np.random.default_rng(7)
    ids = rng.permutation(500).astype(np.int64)
    # heavy ties: sims drawn from a tiny rounded set
    sims = np.round(rng.integers(0, 5, size=(20, 500)) / 4.0 - 0.5, 4)
    take = 7
    idx = annfast._select_topk(ids, sims, take)
    for qi in range(sims.shape[0]):
        ref = np.lexsort((ids, -sims[qi]))[:take]
        assert list(ids[idx[qi]]) == list(ids[ref])
        assert list(sims[qi][idx[qi]]) == list(sims[qi][ref])


def test_select_bottomk_matches_lexsort_with_ties():
    rng = np.random.default_rng(11)
    ids = rng.permutation(300).astype(np.int64)
    vals = np.round(rng.integers(0, 4, size=(10, 300)) / 8.0, 4)
    take = 5
    idx = annfast._select_bottomk(ids, vals, take)
    for qi in range(vals.shape[0]):
        ref = np.lexsort((ids, vals[qi]))[:take]
        assert list(ids[idx[qi]]) == list(ids[ref])


def test_banded_buckets_fast_exact_equality(spark, emb):
    slow = _rows(
        similarity.banded_lsh_buckets(emb, 8, 3), ["vec_id", "band", "bucket"]
    )
    fast = _rows(
        annfast.banded_buckets_fast(emb, 8, 3), ["vec_id", "band", "bucket"]
    )
    assert fast == slow


def test_banded_buckets_fast_random_float32(spark):
    # adversarial: random float32 vectors incl. tiny magnitudes, where the
    # decimal-rounding boundary cases are most likely
    rng = np.random.default_rng(42)
    rows = []
    for i in range(400):
        scale = 10.0 ** rng.integers(-6, 1)
        rows.append(
            (i, [float(np.float32(x)) for x in rng.normal(0, scale, 16)])
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    slow = _rows(
        similarity.banded_lsh_buckets(df, 4, 4), ["vec_id", "band", "bucket"]
    )
    fast = _rows(
        annfast.banded_buckets_fast(df, 4, 4), ["vec_id", "band", "bucket"]
    )
    assert fast == slow


def test_hyperplane_buckets_fast_exact_equality(spark, emb):
    slow = _rows(similarity.hyperplane_lsh_buckets(emb, 8), ["vec_id", "bucket"])
    fast = _rows(
        annfast.hyperplane_buckets_fast_exact(emb, 8), ["vec_id", "bucket"]
    )
    assert fast == slow


def test_lsh_topk_banded_fast_equality(spark, emb):
    cols = ["qid", "nid", "sim", "rank"]
    slow = _rows(similarity.lsh_topk_banded(emb, k=3, bands=8, planes_per_band=3), cols)
    fast = _rows(annfast.lsh_topk_banded_fast(emb, k=3, bands=8, planes_per_band=3), cols)
    assert fast == slow


def test_lsh_topk_banded_fast_query_restricted(spark, emb):
    cols = ["qid", "nid", "sim", "rank"]
    q = emb.filter(F.col("vec_id") < 40)
    full = similarity.lsh_topk_banded(emb, k=3, bands=8, planes_per_band=3)
    expected = _rows(full.filter(F.col("qid") < 40), cols)
    got = _rows(
        annfast.lsh_topk_banded_fast(
            emb, k=3, bands=8, planes_per_band=3, query_df=q
        ),
        cols,
    )
    assert got == expected


def test_lsh_topk_fast_equality(spark, emb):
    cols = ["qid", "nid", "sim", "rank"]
    slow = _rows(similarity.lsh_topk(emb, k=3, n_planes=8), cols)
    fast = _rows(annfast.lsh_topk_fast(emb, k=3, n_planes=8), cols)
    assert fast == slow


def test_lsh_topk_fast_query_restricted(spark, emb):
    cols = ["qid", "nid", "sim", "rank"]
    q = emb.filter(F.col("vec_id") < 40)
    expected = _rows(
        similarity.lsh_topk(emb, k=3, n_planes=8).filter(F.col("qid") < 40),
        cols,
    )
    got = _rows(annfast.lsh_topk_fast(emb, k=3, n_planes=8, query_df=q), cols)
    assert got == expected


def test_ivf_assign_fast_equality(spark, emb, cents):
    cols = ["vec_id", "centroid_id", "centroid_sim"]
    slow = _rows(similarity.ivf_assign(emb, 8, centroids=cents), cols)
    fast = _rows(annfast.ivf_assign_fast(emb, cents), cols)
    assert fast == slow


def test_ivf_probe_cells_fast_equality(spark, emb, cents):
    cols = ["vec_id", "centroid_id", "probe_rank"]
    slow = _rows(ann_tuning.ivf_probe_cells(emb, cents, 6), cols)
    fast = _rows(annfast.ivf_probe_cells_fast(emb, cents, 6), cols)
    assert fast == slow


def test_ivf_topk_fast_equality(spark, emb, cents):
    cols = ["qid", "nid", "sim", "rank"]
    slow = _rows(similarity.ivf_topk(emb, k=3, n_centroids=8, centroids=cents), cols)
    fast = _rows(annfast.ivf_topk_fast(emb, k=3, n_centroids=8, centroids=cents), cols)
    assert fast == slow


def test_ivf_topk_nprobe_fast_equality(spark, emb, cents):
    cols = ["qid", "nid", "sim", "rank"]
    slow = _rows(ann_tuning.ivf_topk_nprobe(emb, k=3, nprobe=6, centroids=cents), cols)
    fast = _rows(annfast.ivf_topk_nprobe_fast(emb, k=3, nprobe=6, centroids=cents), cols)
    assert fast == slow


def test_ivf_topk_nprobe_fast_query_restricted(spark, emb, cents):
    cols = ["qid", "nid", "sim", "rank"]
    q = emb.filter(F.col("vec_id") < 40)
    expected = _rows(
        ann_tuning.ivf_topk_nprobe(emb, k=3, nprobe=6, centroids=cents).filter(
            F.col("qid") < 40
        ),
        cols,
    )
    got = _rows(
        annfast.ivf_topk_nprobe_fast(
            emb, k=3, nprobe=6, centroids=cents, query_df=q
        ),
        cols,
    )
    assert got == expected


def test_cosine_topk_fast2_equality(spark, emb):
    cols = ["qid", "nid", "sim", "rank"]
    q = emb.filter(F.col("vec_id") < 40)
    slow = _rows(similarity.cosine_topk_fast(emb, query_df=q, k=3), cols)
    fast = _rows(annfast.cosine_topk_fast2(emb, query_df=q, k=3), cols)
    assert fast == slow


def test_l2_topk_fast_equality(spark, emb):
    cols = ["qid", "nid", "d2", "rank"]
    q = emb.filter(F.col("vec_id") % 100 == 0)
    slow = _rows(similarity.l2_topk(emb, query_df=q, k=3), cols)
    fast = _rows(annfast.l2_topk_fast(emb, query_df=q, k=3), cols)
    assert fast == slow
