"""Deterministic Bloom filter: no false negatives, engine-vs-pure-python
bit equality (including forced false positives at tiny m), bitmap size
bound, and broadcast probe plan."""

from __future__ import annotations

import hashlib

import pytest

from work_order_pdf_extractor_spark.operators import membership


def _py_positions(value: str, m_bits: int, k: int) -> list[int]:
    """Pure-python twin of the engine's md5-prefix position function."""
    return [
        int(hashlib.md5(f"{i}#{value}".encode()).hexdigest()[:8], 16) % m_bits
        for i in range(k)
    ]


@pytest.fixture(scope="module")
def items(spark):
    return spark.createDataFrame(
        [(i, f"document number {i}") for i in range(60)],
        "doc_id long, canon string",
    )


def test_no_false_negatives(spark, items):
    """Every inserted item must probe present — the Bloom contract."""
    bloom = membership.bloom_build(items)
    out = membership.bloom_probe(items, bloom).collect()
    assert len(out) == 60
    assert all(r["bloom_maybe"] for r in out)


def test_verdicts_match_pure_python_bitmap(spark, items):
    """At a tiny m the filter MUST produce false positives, and every
    verdict (true and false) must equal a pure-python reconstruction of
    the same bitmap — determinism is the operator's whole point."""
    m, k = 128, 2
    half = items.filter("doc_id < 30")
    probe = items.filter("doc_id >= 30")
    bloom = membership.bloom_build(half, m_bits=m, k=k)
    got = {
        r["doc_id"]: r["bloom_maybe"]
        for r in membership.bloom_probe(probe, bloom, m_bits=m, k=k).collect()
    }
    bits = set()
    for i in range(30):
        bits.update(_py_positions(f"document number {i}", m, k))
    expect = {
        i: all(p in bits for p in _py_positions(f"document number {i}", m, k))
        for i in range(30, 60)
    }
    assert got == expect
    assert any(expect.values()), "tiny m should force at least one FP"


def test_bitmap_is_bounded(spark, items):
    """The build output is at most ceil(m/63) rows no matter the input —
    the property that makes the 100-TB broadcast cheap."""
    m = 1 << 10
    bloom = membership.bloom_build(items, m_bits=m, k=4).collect()
    assert len(bloom) <= m // 63 + 1
    assert all(r["word"] != 0 for r in bloom)


def test_incremental_dedup_verdicts(spark):
    corpus = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100, "text 7"), (101, "text 13"), (102, "brand new doc")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in membership.bloom_dedup_incremental(corpus, batch).collect()
    }
    assert out[100]["exact_dup"] is True and out[100]["bloom_maybe"] is True
    assert out[101]["exact_dup"] is True and out[101]["bloom_maybe"] is True
    assert out[102]["exact_dup"] is False
    # no false negatives ever: maybe must cover every exact dup
    assert all(r["bloom_maybe"] for r in out.values() if r["exact_dup"])
    assert all(
        not r["false_positive"] or (r["bloom_maybe"] and not r["exact_dup"])
        for r in out.values()
    )


def test_probe_broadcasts_bitmap(spark, items):
    bloom = membership.bloom_build(items)
    plan = (
        membership.bloom_probe(items, bloom)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
