"""Span-level decontamination: hand-computed spans on constructed
contaminated fixtures, island-merge edge cases, excision round-trip,
and DuckDB-oracle agreement on the documents table."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from work_order_pdf_extractor_spark.operators import decontam

BENCH_TEXT = "alpha beta gamma delta epsilon"


@pytest.fixture(scope="module")
def corpus(spark):
    # doc 1: one exact 3-gram hit mid-document -> one span [2, 4]
    # doc 2: two ADJACENT hits (positions 1 and 2) -> merged span [1, 4]
    # doc 3: two hits separated by > n -> TWO spans
    # doc 4: clean -> no rows
    # doc 5: the whole benchmark verbatim -> one span covering all hits
    rows = [
        (1, "x y alpha beta gamma z w"),
        (2, "q alpha beta gamma delta r s"),
        (3, "alpha beta gamma x x x x beta gamma delta y"),
        (4, "totally unrelated text with no overlap at all"),
        (5, BENCH_TEXT),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(100, BENCH_TEXT)], "doc_id long, text string"
    )


def test_spans_hand_computed(spark, corpus, bench):
    out = {
        (r.doc_id, r.span_start, r.span_end, r.n_matched_shingles)
        for r in decontam.decontaminate_spans(corpus, bench).collect()
    }
    assert out == {
        # doc 1: 'alpha beta gamma' at token 2 -> span [2,4], 1 shingle
        (1, 2, 4, 1),
        # doc 2: hits at pos 1 ('alpha beta gamma') and 2 ('beta gamma
        # delta') overlap -> merged [1,4], 2 shingles
        (2, 1, 4, 2),
        # doc 3: hit at 0 -> [0,2]; hit at 7 -> [7,9] (gap > n)
        (3, 0, 2, 1),
        (3, 7, 9, 1),
        # doc 5: hits at 0,1,2 all merge -> [0,4], 3 shingles
        (5, 0, 4, 3),
    }


def test_adjacent_touching_spans_merge(spark, bench):
    """Hits whose windows merely TOUCH (pos == prev + n) must merge:
    tokens between them are all covered."""
    df = spark.createDataFrame(
        # hits at pos 1 and pos 4: windows [1,3] and [4,6] touch
        [(9, "z alpha beta gamma beta gamma delta w")],
        "doc_id long, text string",
    )
    rows = decontam.decontaminate_spans(df, bench).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.span_start, r.span_end, r.n_matched_shingles) == (1, 6, 2)


def test_spans_partition_invariant(spark, corpus, bench):
    one = decontam.decontaminate_spans(corpus.coalesce(1), bench)
    many = decontam.decontaminate_spans(corpus.repartition(7), bench)
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect())
    )


def test_excise_removes_exactly_the_spans(spark, corpus, bench):
    spans = decontam.decontaminate_spans(corpus, bench)
    out = {r.doc_id: r for r in decontam.excise_spans(corpus, spans).collect()}
    assert out[1].clean_text == "x y z w"
    assert out[1].n_tokens_removed == 3
    assert out[2].clean_text == "q r s"
    assert out[2].n_tokens_removed == 4
    assert out[3].clean_text == "x x x x y"
    assert out[3].n_tokens_removed == 6
    # clean doc passes through BYTE-identical with zero removed
    assert out[4].clean_text == corpus.filter(F.col("doc_id") == 4).first().text
    assert out[4].n_tokens_removed == 0
    # fully-contaminated doc excises to empty
    assert out[5].clean_text == ""
    assert out[5].n_tokens_removed == 5


def test_excised_text_contains_no_benchmark_shingle(spark, corpus, bench):
    """Post-excision invariant: no 3-gram of any clean text appears in
    the benchmark shingle set (the property the recipe exists for)."""
    spans = decontam.decontaminate_spans(corpus, bench)
    clean = decontam.excise_spans(corpus, spans).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    residual = decontam.decontaminate_spans(clean, bench)
    assert residual.count() == 0


def test_query_matches_duckdb_oracle(spark):
    """Driver-shape check at sf0.001: the registry query and its oracle
    SQL agree row-for-row."""
    from work_order_pdf_extractor_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    for qname, fn, sql in [
        ("decontaminate_spans", Q.q_decontaminate_spans, Q.SQL_DECONTAMINATE_SPANS),
        ("excise_spans", Q.q_excise_spans, Q.SQL_EXCISE_SPANS),
    ]:
        sdf = fn(spark, sf).toPandas()
        odf = con.sql(sql).df()
        assert len(sdf) == len(odf), qname
        key = sorted(sdf.columns)
        s = sorted(map(tuple, sdf[key].astype(str).values.tolist()))
        o = sorted(map(tuple, odf[key].astype(str).values.tolist()))
        assert s == o, qname
