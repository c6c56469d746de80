"""Repeated-span audit + asymmetric containment (operators/dedup.py r5).

Hand-built fixtures with hand-computable answers pin the semantics:
coverage counts token positions (not shingle occurrences), within-doc
boilerplate counts, and containment catches the quote-inside-a-long-doc
case symmetric Jaccard misses.
"""

import pytest
from pyspark.sql import functions as F

from work_order_pdf_extractor_spark.operators import dedup


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # docs 1 & 2 share the 4-token phrase "the quick brown fox":
        # 3-grams "the quick brown" and "quick brown fox" are repeated,
        # covering token positions 0..3 in doc 1 and 2..5 in doc 2
        (1, "the quick brown fox sat alone yesterday evening"),
        (2, "once again the quick brown fox appeared suddenly"),
        # doc 3 repeats its own phrase internally (within-doc boilerplate)
        (3, "alpha beta gamma filler one alpha beta gamma filler two"),
        # doc 4 shares nothing
        (4, "completely unrelated words with zero overlap here"),
        # doc 5 is entirely contained in doc 6
        (5, "press the red button now"),
        (6, "to finish the job press the red button now and then leave quietly"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repeated_spans_counts_positions(spark, corpus):
    got = {
        r.doc_id: (r.n_tokens, r.n_repeated_tokens)
        for r in dedup.repeated_spans(corpus, n=3, min_count=2).collect()
    }
    # doc1: positions 0-3 covered ("the quick brown fox") -> 4 tokens
    assert got[1] == (8, 4)
    # doc2: positions 2-5 covered -> 4 tokens
    assert got[2] == (8, 4)
    # doc3: "alpha beta gamma filler" occurs twice -> both occurrences
    # covered: positions 0-3 and 5-8 (via the two repeated 3-grams each)
    assert got[3] == (10, 8)
    # doc4: nothing repeated
    assert got[4] == (7, 0)


def test_repeated_spans_fraction(spark, corpus):
    row = {
        r.doc_id: r.repeated_frac
        for r in dedup.repeated_spans(corpus, n=3, min_count=2).collect()
    }
    assert row[1] == 0.5
    assert row[4] == 0.0


def test_containment_catches_quotes_jaccard_misses(spark, corpus):
    cont = {
        (r.doc1, r.doc2): r.containment
        for r in dedup.containment_pairs(corpus, n=3, threshold=0.8).collect()
    }
    # doc5 (3 shingles) fully inside doc6 -> containment 1.0, doc5 first
    assert cont[(5, 6)] == 1.0
    assert (6, 5) not in cont  # the long side is NOT contained
    # symmetric Jaccard on the same pair is small (3 common / 13 union)
    jac = dedup.ngram_jaccard_pairs(corpus, n=3, threshold=0.1).collect()
    j = {(r.doc1, r.doc2): r.jaccard for r in jac}
    assert j.get((5, 6), 0.0) < 0.3


def test_containment_candidates_path_matches_all_pairs(spark, corpus):
    cand = spark.createDataFrame(
        [(5, 6), (1, 2)], "doc1 long, doc2 long"
    )
    via_cand = {
        (r.doc1, r.doc2): r.containment
        for r in dedup.containment_pairs(
            corpus, n=3, threshold=0.0, candidates=cand
        ).collect()
    }
    full = {
        (r.doc1, r.doc2): r.containment
        for r in dedup.containment_pairs(
            corpus, n=3, threshold=0.0
        ).collect()
    }
    for pair in [(5, 6), (6, 5), (1, 2), (2, 1)]:
        assert via_cand.get(pair) == full.get(pair)


def test_positioned_shingles_keep_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "x y z x y z")], "doc_id long, text string"
    )
    rows = dedup.positioned_shingles(df, n=3).collect()
    # 4 shingles, including "x y z" at pos 0 AND pos 3
    assert len(rows) == 4
    assert sorted(r.pos for r in rows if r.shingle == "x y z") == [0, 3]
