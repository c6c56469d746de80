"""Sampling / splitting / packing invariants (the guarantees the docstrings
claim, checked on the sf0.001 documents table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from work_order_pdf_extractor_spark.operators import sampling

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_stratified_rates_per_stratum(spark, docs):
    """Each stratum is sampled at ~the requested fraction (hash-uniform
    within stratum), and membership is identical across partitionings."""
    frac = 0.3
    s1 = sampling.stratified_sample(docs, frac, "lang").toPandas()
    s2 = sampling.stratified_sample(docs.repartition(17), frac, "lang").toPandas()
    assert sorted(s1.doc_id) == sorted(s2.doc_id)
    totals = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    got = s1.groupby("lang").size()
    for lang, n in totals.items():
        rate = got.get(lang, 0) / n
        # binomial-ish tolerance on small strata
        assert abs(rate - frac) < 0.15, (lang, rate)


def test_split_is_leakage_safe(spark, docs):
    """Assignment depends on the id only: reshuffled input produces the
    SAME split, and the two sides partition the corpus exactly."""
    a = sampling.train_test_split(docs, 0.8).select("doc_id", "split").toPandas()
    b = (
        sampling.train_test_split(docs.repartition(23).sortWithinPartitions("n_chars"), 0.8)
        .select("doc_id", "split")
        .toPandas()
    )
    ma = dict(zip(a.doc_id, a.split))
    mb = dict(zip(b.doc_id, b.split))
    assert ma == mb
    n_train = sum(1 for v in ma.values() if v == "train")
    assert 0.7 < n_train / len(ma) < 0.9


def test_pack_chunks_invariants(spark, docs):
    """Every chunk except each shard's last is exactly full; each document's
    packed tokens reassemble contiguously to its token count; chunk offsets
    tile [0, budget)."""
    B = 64
    toks = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    packed = sampling.pack_chunks(
        toks, B, shard_col="source", order_col="doc_id",
        token_col="n_tokens", id_col="doc_id",
    ).toPandas()
    assert len(packed) > 0
    # per-chunk fullness
    per_chunk = packed.groupby(["shard", "chunk_id"]).n_tok.sum()
    last_chunk = packed.groupby("shard").chunk_id.max()
    for (shard, cid), total in per_chunk.items():
        if cid == last_chunk[shard]:
            assert 0 < total <= B
        else:
            assert total == B, (shard, cid, total)
    # per-document reassembly: offsets contiguous from 0, sum == token count
    want = {
        (r.source, r.doc_id): r.n_tokens for r in toks.toPandas().itertuples()
    }
    for (shard, did), g in packed.groupby(["shard", "id"]):
        g = g.sort_values("doc_off")
        assert g.doc_off.iloc[0] == 0
        assert (g.doc_off + g.n_tok).iloc[-1] == want[(shard, did)]
        assert (g.doc_off.values[1:] == (g.doc_off + g.n_tok).values[:-1]).all()
    # chunk_off within [0, B)
    assert ((packed.chunk_off >= 0) & (packed.chunk_off < B)).all()


def test_pack_chunks_deterministic_across_partitionings(spark, docs):
    toks = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    key = ["shard", "chunk_id", "id"]
    a = (
        sampling.pack_chunks(toks, 128)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    b = (
        sampling.pack_chunks(toks.repartition(31), 128)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_mix_corpus_hits_target_proportions(spark, docs):
    out = sampling.mix_corpus(
        docs, {"src0": 0.5, "src1": 0.25, "src2": 0.25}
    )
    sizes = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(sizes) <= {"src0", "src1", "src2"}  # other domains dropped
    n0 = sizes["src0"]
    # binding domain (largest relative target) kept whole; others near half
    total_src0 = docs.filter(F.col("source") == "src0").count()
    assert n0 == total_src0
    for s in ("src1", "src2"):
        assert abs(sizes[s] / n0 - 0.5) < 0.25  # hash-threshold quantization
    fr = {r["source"]: r["keep_frac"] for r in out.select("source", "keep_frac").distinct().collect()}
    assert fr["src0"] == 1.0 and fr["src1"] == 0.5 and fr["src2"] == 0.5


def test_mix_corpus_deterministic_and_subset(spark, docs):
    w = {"src3": 0.5, "src4": 0.5}
    a = sorted(r["doc_id"] for r in sampling.mix_corpus(docs, w).collect())
    b = sorted(
        r["doc_id"] for r in sampling.mix_corpus(docs.repartition(17), w).collect()
    )
    assert a == b and len(a) > 0
    kept_ids = set(a)
    all_ids = {
        r["doc_id"]
        for r in docs.filter(F.col("source").isin("src3", "src4")).collect()
    }
    assert kept_ids <= all_ids


def test_mix_corpus_empty_weights(spark, docs):
    out = sampling.mix_corpus(docs, {"nonexistent": 1.0})
    assert out.count() == 0
