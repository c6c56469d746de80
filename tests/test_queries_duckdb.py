"""Driver-style DuckDB oracle check for every REGISTRY query (SURVEY §5.2).

Runs at sf0.001 in CI; the driver's own gate runs sf0.01 — the SQL and the
Spark plans are scale-independent, and float determinism is engineered (see
queries.py module docstring), so passing here predicts passing there.
"""

from __future__ import annotations

import pytest

from work_order_pdf_extractor_spark.queries import REGISTRY

from .duck_compare import compare, duck_run

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_duckdb(spark, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF).toPandas()
    if sql is None:
        assert len(sdf) >= 0
        return
    ddf = duck_run(sql, SF)
    ok, msg = compare(sdf, ddf)
    assert ok, f"{name}: {msg}"
    assert len(sdf) > 0, f"{name}: empty result weakens the check"


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    n = df.count()
    assert n > 0
    assert {"conv_id", "turn_idx", "extracted_text", "matched", "status"} <= set(
        df.columns
    )
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(REGISTRY)


def test_approx_distinct_within_bound(spark):
    """HLL++ estimate within 5×rsd of exact — the query now emits the
    bound check itself (within_bound), which is what the DuckDB oracle
    asserts end-to-end."""
    df = REGISTRY["approx_distinct"][0](spark, SF).toPandas()
    assert len(df) > 0
    assert df.within_bound.all()
    assert (df.exact_parts > 0).all()
