"""r7 sweep of the ``persisted_out`` cache-lifecycle contract (VERDICT r6
"what's wrong" #2): the three query wrappers that persist a shared
shingle table now expose the same escape hatch the r6 round added to
``bigram_lm_score`` — repeated callers collect the persisted DataFrames
and unpersist them once the plan is consumed."""

from __future__ import annotations

import pytest

from work_order_pdf_extractor_spark import queries as Q

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name", ["dedup_components", "cluster_sample", "lsh_pair_quality"]
)
def test_persisted_out_contract(spark, name):
    fn = Q.REGISTRY[name][0]
    out: list = []
    df = fn(spark, SF, persisted_out=out)
    assert len(out) == 1, "exactly the shared shingle table is persisted"
    df.write.format("noop").mode("overwrite").save()
    assert out[0].storageLevel.useMemory or out[0].storageLevel.useDisk
    for cached in out:
        cached.unpersist()
    assert not (
        out[0].storageLevel.useMemory or out[0].storageLevel.useDisk
    ), "unpersist through the escape hatch must release the cache"
