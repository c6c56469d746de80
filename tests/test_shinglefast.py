"""Differential tests: shinglefast twins vs the JVM originals."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from work_order_pdf_extractor_spark.operators import shinglefast
from work_order_pdf_extractor_spark.operators.common import (
    ensure_parallelism,
    word_shingles,
)

SF = "/root/testdata/sf0.01"

EDGE_DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3, 4, 5, 6],
        "text": [
            "a b c d e",
            "a  b   c",        # consecutive spaces -> empty tokens
            "x y",             # fewer than n words
            "",                # empty
            None,              # null text
            " lead and trail ",
            "dup dup dup dup dup",  # repeated shingles collapse
        ],
    }
)


def _jvm_positioned(df, n=3, text_col="text", id_col="doc_id"):
    """The pre-r7 JVM formulation of positioned_shingles, kept here as
    the differential reference."""
    words = ensure_parallelism(
        df.select(id_col, F.split(text_col, " ").alias("ws"))
    )
    sz = F.size("ws")
    idx = F.sequence(F.lit(0), sz - n)
    sh = words.filter(sz >= n).select(
        id_col, F.explode(idx).alias("pos"), "ws"
    )
    parts = [F.col("ws")[F.col("pos") + k] for k in range(n)]
    return sh.select(id_col, "pos", F.concat_ws(" ", *parts).alias("shingle"))


def test_word_shingles_fast_matches_on_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    slow = sorted(
        tuple(r) for r in word_shingles(docs, 3).collect()
    )
    fast = sorted(
        tuple(r) for r in shinglefast.word_shingles_fast(docs, 3).collect()
    )
    assert fast == slow


def test_word_shingles_fast_matches_on_edge_docs(spark):
    docs = spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")
    for n in (2, 3, 5):
        slow = sorted(tuple(r) for r in word_shingles(docs, n).collect())
        fast = sorted(
            tuple(r)
            for r in shinglefast.word_shingles_fast(docs, n).collect()
        )
        assert fast == slow, f"n={n}"


def test_positioned_shingles_fast_matches(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    slow = sorted(tuple(r) for r in _jvm_positioned(docs, 3).collect())
    fast = sorted(
        tuple(r)
        for r in shinglefast.positioned_shingles_fast(docs, 3).collect()
    )
    assert fast == slow


def test_positioned_shingles_fast_matches_edge(spark):
    docs = spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")
    for n in (2, 3):
        slow = sorted(tuple(r) for r in _jvm_positioned(docs, n).collect())
        fast = sorted(
            tuple(r)
            for r in shinglefast.positioned_shingles_fast(docs, n).collect()
        )
        assert fast == slow, f"n={n}"
