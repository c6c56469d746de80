"""Product quantization: training determinism, encode completeness,
codes-only search (the storage-win path), and ADC neighbor quality on a
clustered synthetic dataset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from work_order_pdf_extractor_spark.operators import pq


@pytest.fixture(scope="module")
def vectors(spark):
    """8 tight clusters of 64-dim vectors: cluster c centered at
    one-hot-ish pattern c, members jittered deterministically."""
    rows = []
    for vid in range(80):
        c = vid % 8
        vec = [
            float(10.0 if d // 8 == c else 0.0) + ((vid * 7 + d) % 5) * 0.1
            for d in range(64)
        ]
        rows.append((vid, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_codebooks_deterministic(vectors):
    a = sorted(map(str, pq.pq_codebooks(vectors).collect()))
    b = sorted(map(str, pq.pq_codebooks(vectors).collect()))
    assert a == b
    got = pq.pq_codebooks(vectors).collect()
    assert all(len(r["cv"]) == 8 for r in got)
    assert all(0 <= r["code_id"] < pq.PQ_KSUB for r in got)


def test_encode_every_vector_all_subspaces(vectors):
    cbs = pq.pq_codebooks(vectors)
    out = pq.pq_encode(vectors, cbs).collect()
    assert len(out) == 80
    assert all(len(r["code_str"].split("-")) == pq.PQ_M for r in out)


def test_adc_prefers_same_cluster(vectors):
    """With well-separated clusters, every ADC neighbor of a query must
    come from the query's own cluster — the PQ recall sanity check."""
    cbs = pq.pq_codebooks(vectors)
    queries = vectors.filter(F.col("vec_id") < 8)  # one per cluster
    res = pq.pq_topk(vectors, cbs, queries, k=3).collect()
    assert len(res) == 8 * 3
    for r in res:
        assert r["nid"] % 8 == r["qid"] % 8, f"cross-cluster neighbor: {r}"


def test_codes_only_search_matches_inline_encode(vectors):
    """Searching precomputed codes with df=None must equal the inline
    path — proof the corpus embeddings are not needed at search time."""
    cbs = pq.pq_codebooks(vectors)
    queries = vectors.filter(F.col("vec_id") < 4)
    inline = pq.pq_topk(vectors, cbs, queries, k=3).collect()
    codes = pq.pq_codes(vectors, cbs)
    codes_only = pq.pq_topk(None, cbs, queries, k=3, codes=codes).collect()
    assert sorted(map(str, inline)) == sorted(map(str, codes_only))


def test_codes_only_search_never_scans_corpus_vectors(spark):
    """With materialized codes, the search plan reads the embeddings
    parquet exactly ONCE — for the query vectors — never for the corpus:
    the PQ storage win, visible in the physical plan's file scans."""
    import re

    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cbs = spark.createDataFrame(
        pq.pq_codebooks(emb).collect(), "j int, code_id int, cv array<double>"
    )
    codes = spark.createDataFrame(
        pq.pq_codes(emb, cbs).collect(), "sid long, j int, code long"
    )
    queries = emb.filter(F.col("vec_id") < 3)
    plan = (
        pq.pq_topk(None, cbs, queries, k=2, codes=codes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_scans = len(re.findall(r"embeddings\.parquet", plan))
    assert n_scans >= 1, "query side must scan the vectors"
    # every scan mention belongs to ONE FileScan node (the query side)
    assert plan.count("FileScan") == 1, plan[:2000]


def test_compression_ratio_docstringed():
    """The claimed storage win: 64 float32 = 256 bytes vs 8 small codes."""
    assert 256 / pq.PQ_M >= 30
