"""Physical-plan assertions for the round-5 session-3 queries: the shapes
that make them survive a 100×-scale-up must be visible in the plan."""

from __future__ import annotations

from work_order_pdf_extractor_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_quality_gate_single_shuffle(spark):
    """row_number and the per-stratum count share one lang partitioning:
    exactly ONE Exchange for two window functions."""
    p = _plan(Q.REGISTRY["quality_percentile_gate"][0](spark, SF))
    assert p.count("Exchange") == 1
    assert p.count("Window") == 2


def test_weighted_sample_is_take_ordered(spark):
    """The top-k is TakeOrderedAndProject (per-partition k then O(k) on
    the driver), never a global Sort; the min-ticket agg is partial
    before its Exchange (map-side combine absorbs the ticket fan-out)."""
    p = _plan(Q.REGISTRY["weighted_sample"][0](spark, SF))
    assert "TakeOrderedAndProject" in p
    assert "partial_min" in p
    assert p.count("Exchange") == 1


def test_retention_cohorts_no_cartesian(spark):
    """Distinct, cohort-min, and the triangle agg are all partial-then-
    final hash aggregates; the user_id self-join is an equi-join (hash or
    sort-merge under AQE), never a nested loop."""
    p = _plan(Q.REGISTRY["retention_cohorts"][0](spark, SF))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert "partial_count" in p


def test_adam7_payload_never_shuffles(spark):
    """Payload synthesis and decode are back-to-back MapInPandas on the
    same partitioning: the only Exchange is ensure_parallelism's
    doc_id-only fan-out BEFORE the payload exists, so image bytes never
    cross the wire."""
    p = _plan(Q.REGISTRY["png_adam7_decode"][0](spark, SF))
    assert p.count("MapInPandas") == 2
    assert p.count("Exchange") == 1
    pre, _, _post = p.partition("MapInPandas")
    assert "payload" not in pre  # nothing above the decode carries bytes


def test_bigram_lm_vocab_is_broadcast_and_aggs_partial(spark):
    """The 1-row vocabulary scalar joins as a broadcast (the only
    nested-loop in the plan — build side is exactly one row); both count
    tables are partial-then-final so Zipf whales combine map-side; and
    the corpus is exploded exactly twice, not once per consumer — the
    per-doc bigram-count and vocabulary tables are persisted and each
    read back by ALL their consumers (>= 4 InMemoryTableScans: bigram
    counts x2, unigrams x2)."""
    p = _plan(Q.REGISTRY["bigram_lm_score"][0](spark, SF))
    assert p.count("BroadcastNestedLoop") == 1
    assert "partial_count" in p
    assert "CartesianProduct" not in p
    assert p.count("InMemoryTableScan") >= 4


def test_lsh_pair_quality_shares_persisted_shingles(spark):
    """Candidate and truth branches must read the SAME persisted shingle
    table (>=2 InMemoryTableScans), and the exact-truth pair set comes
    from the inverted-index equi-join, never a quadratic scan."""
    p = _plan(Q.REGISTRY["lsh_pair_quality"][0](spark, SF))
    assert p.count("InMemoryTableScan") >= 2
    assert "CartesianProduct" not in p
