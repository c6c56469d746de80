"""split_pdf_pages: the reference's 1→N page explode
(`work_order_extractor.py:1390-1445`) as array+posexplode (SURVEY §2.9)."""

from __future__ import annotations

import base64

import pandas as pd

from work_order_pdf_extractor_spark.core import pdfparse
from work_order_pdf_extractor_spark.operators.extract import split_pdf_pages


def _pdf_turn(conv, idx, pages):
    data = pdfparse.build_pdf(pages)
    return (conv, idx, "tool", base64.b64encode(data).decode(), "pdf_reader",
            pd.Timestamp("2026-01-01"))


def test_page_split_explodes_in_order(spark):
    rows = [
        _pdf_turn("c1", 0, [[("text", 40, 700, 10, f"page {i} body")] for i in range(1, 4)]),
        _pdf_turn("c1", 1, [[("text", 40, 700, 10, "solo page")]]),
        ("c1", 2, "user", "not a pdf", "", pd.Timestamp("2026-01-01")),
        ("c1", 3, "tool", "garbage-b64!!!", "pdf_reader", pd.Timestamp("2026-01-01")),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    )
    out = split_pdf_pages(df).toPandas().sort_values(
        ["turn_idx", "page_no"], ignore_index=True
    )
    # 3 pages + 1 page; non-PDF and malformed rows contribute nothing
    assert len(out) == 4
    three = out[out.turn_idx == 0]
    assert list(three.page_no) == [1, 2, 3]
    assert list(three.page_text) == [f"page {i} body" for i in range(1, 4)]
    # reference's `_page_%03d` naming (:1421)
    assert list(three.page_name) == [f"c1_0_page_{i:03d}.pdf" for i in range(1, 4)]
    assert out[out.turn_idx == 1].page_text.iloc[0] == "solo page"


def test_udtf_variant_matches_explode(spark):
    """Differential: the Spark 4 Python UDTF twin must produce the same
    rows as the default array+posexplode form."""
    import random

    from work_order_pdf_extractor_spark import fixtures
    from work_order_pdf_extractor_spark.operators.extract import (
        split_pdf_pages_udtf,
    )

    rng = random.Random(3)
    rows = []
    for i in range(12):
        n_pages = rng.randint(1, 3)
        rows.append(
            _pdf_turn(
                "cX", i,
                [[("text", 40, 700, 10, f"doc{i} pg{p}")] for p in range(n_pages)],
            )
        )
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    )
    a = (
        split_pdf_pages(df)
        .select("conv_id", "turn_idx", "page_no", "page_name", "page_text")
        .toPandas()
        .sort_values(["turn_idx", "page_no"], ignore_index=True)
    )
    b = split_pdf_pages_udtf(df).toPandas().sort_values(
        ["turn_idx", "page_no"], ignore_index=True
    )
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)
