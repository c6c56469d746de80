"""N-gram language-model scoring for corpus quality filtering.

The CCNet/KenLM recipe — score every document under a corpus-trained
n-gram LM and gate on the score — is a standard stage of published
pretraining pipelines. This is the Spark-first shape of that stage: the
"model" is two count tables (unigram, bigram) built from the corpus
itself with one groupBy each, and scoring is a join back onto those
tables — no Python in the loop, no model file, whole plan declarative.

Cross-engine exactness: instead of log-probabilities (float ln differs in
the last ulp across engines), each bigram contributes the INTEGER-scaled
add-one-smoothed conditional ``((c(w1,w2) + 1) * 1_000_000) //
(c(w1) + V)`` — a monotone transform of the probability, summed per
document. Same trick as the DSIR importance weights (``queries.py``
``dsir_weights``): the gate ranks documents identically and the DuckDB
oracle matches bit-for-bit.

Scale shape (100 TB): tokens explode → two groupBys on token / bigram
keys. Both keys are Zipf-skewed, but counts are algebraic aggregates so
map-side partial aggregation absorbs the whales before the shuffle; the
score join's build side is the OBSERVED-bigram table (bounded by corpus
tokens, heavily combined), its probe side the exploded bigrams — AQE's
skew-join split covers the hot keys ("the the") at the join. The
vocabulary-size scalar joins in as a broadcast single row, never a
driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .common import ensure_parallelism

LM_SCALE = 1_000_000  # integer probability scale (see module docstring)


def _tokens(df: DataFrame, text_col: str = "text") -> F.Column:
    """Lower-cased alphabetic tokens; the [^a-z]+ → ' ' normalization is
    textually mirrored by the DuckDB oracle (regexp_replace 'g' flag)."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " "), " "),
        lambda t: t != F.lit(""),
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    persisted_out: list | None = None,
) -> DataFrame:
    """Per-document add-one-smoothed bigram-LM affinity.

    Returns ``(id_col, n_bigrams, lm_score)`` with one row per input
    document (zero-bigram docs score 0): ``lm_score = Σ over the doc's
    bigram OCCURRENCES of ((c(w1,w2)+1)·SCALE) // (c(w1)+V)`` where the
    counts come from the whole corpus and V is the distinct-unigram
    vocabulary size.

    Plan shape: Catalyst has no common-subplan reuse across separate
    aggregations, so a naive formulation re-explodes the corpus once per
    consumer (measured: 5 scans / 4 explodes). Instead the ONE bigram
    explode is immediately collapsed to per-doc bigram counts
    (``c_doc`` — partial aggregation absorbs the occurrence fan-out
    map-side) and that compact table is persisted once for its three
    consumers (corpus bigram counts, the score join, n_bigrams); the
    vocabulary table is persisted for its two (c1 join, V scalar). A
    one-shot harness can let session teardown reclaim the cached blocks;
    a long-lived caller passes ``persisted_out`` (a list the persisted
    DataFrames are appended to — same contract as
    ``plans.ingest.incremental_ingest``) and unpersists after the
    result is consumed."""
    toks = ensure_parallelism(
        df.select(id_col, _tokens(df, text_col).alias("ts"))
    )
    # bigram occurrences per doc: zip the array with itself shifted by
    # one; the greatest() guard keeps ANSI slice() total on empty/1-token
    # docs. Collapsed to per-doc counts in the same stage as the explode.
    bgc = (
        toks.select(
            id_col,
            F.explode(
                F.expr(
                    "zip_with(slice(ts, 1, greatest(size(ts) - 1, 0)),"
                    "         slice(ts, 2, greatest(size(ts) - 1, 0)),"
                    "         (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("bg"),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_doc"))
        .persist()
    )

    uni = (
        toks.select(F.explode("ts").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
        .persist()
    )
    if persisted_out is not None:
        persisted_out.extend([bgc, uni])
    big = bgc.groupBy("w1", "w2").agg(F.sum("c_doc").alias("c12"))
    vocab = uni.agg(F.count(F.lit(1)).alias("vsize"))  # 1 row → broadcast

    part = (
        bgc.join(big, ["w1", "w2"])
        .join(uni, "w1")
        .join(F.broadcast(vocab))
        .select(
            id_col,
            "c_doc",
            F.expr(f"((c12 + 1) * {LM_SCALE}) div (c1 + vsize)").alias("part"),
        )
    )
    scored = part.groupBy(id_col).agg(
        F.sum("c_doc").alias("n_bigrams"),
        F.sum(F.col("c_doc") * F.col("part")).alias("lm_score"),
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("lm_score", F.lit(0)).cast("long").alias("lm_score"),
        )
    )
