"""Golden equality at the 'small' scale tier (FIXTURES.md §1): ~19k turns
including three whale conversations of 2200+ turns — the salting path
carries real skew here, and per-turn equality must still be exact."""

from __future__ import annotations

import pytest

from work_order_pdf_extractor_spark import fixtures, oracle
from work_order_pdf_extractor_spark.plans import pipeline, skew


@pytest.fixture(scope="module")
def small_pd():
    return fixtures.gen_transcripts("small")


@pytest.fixture(scope="module")
def small_golden(small_pd, ref_orders_pd):
    return oracle.extract_goldens(small_pd, ref_orders_pd)


def test_small_scale_with_whales(spark, small_pd, small_golden, ref_orders_df):
    lengths = small_pd.conv_id.value_counts()
    assert (lengths >= skew.DEFAULT_WHALE_THRESHOLD).sum() >= 3, "fixture lost its whales"

    df = spark.createDataFrame(small_pd)
    res = pipeline.run_pipeline(df, ref_orders_df).toPandas()
    assert len(res) == len(small_golden)

    m = res.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    g = small_golden.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert (m.conv_id.values == g.conv_id.values).all()
    assert m.extracted_text.fillna("\0").equals(g.extracted_text.fillna("\0"))
    assert (m.matched.values == g.matched.values).all()
    assert (m.status.values == g.status.values).all()
