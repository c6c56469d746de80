"""Corpus-hygiene operators for training-data pipelines: repetition
scoring (Gopher-style duplicate-n-gram fraction), PII redaction, and
benchmark decontamination.

All three follow the engine's scale rules: repetition and redaction are
pure row-local JVM expressions (no explode, no shuffle, no Python);
decontamination shuffles only n-gram hashes of the SMALL benchmark side
(broadcast) plus per-doc overlap counts — the corpus text itself never
enters an Exchange. Published-heuristic provenance: the duplicate-n-gram
quality rule family is from the public Gopher/MassiveText filtering
literature; decontamination-by-n-gram-overlap is the standard published
eval-hygiene technique (e.g. GPT-2/GPT-3 appendix descriptions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import word_shingles

# Patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB oracle): character classes, bounded repetition, no backrefs.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def repetition_scores(
    df: DataFrame,
    n: int = 2,
    max_dup_ratio: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplicate word-n-gram fraction per document (Gopher-style
    repetition rule): ``dup_ratio = 1 - distinct_ngrams / total_ngrams``,
    flagged ``repetitive`` above ``max_dup_ratio``.

    Entirely row-local — the n-gram list is built with
    ``transform(sequence(...))`` inside the row (no explode), so the
    operator is a narrow map over the scan at any corpus size. Documents
    with fewer than ``n`` words get NULL ratios and ``repetitive=false``
    (zero-guarded for ANSI mode)."""
    ws = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(ws) - n),
        lambda i: F.concat_ws(" ", *[ws[i + k] for k in range(n)]),
    )
    n_grams = F.when(F.size(ws) >= n, F.size(ws) - (n - 1))
    n_distinct = F.when(F.size(ws) >= n, F.size(F.array_distinct(grams)))
    dup_ratio = F.round((n_grams - n_distinct) / n_grams, 6)
    return df.select(
        id_col,
        n_grams.cast("int").alias("n_grams"),
        n_distinct.cast("int").alias("n_distinct"),
        dup_ratio.alias("dup_ratio"),
        F.coalesce(dup_ratio > max_dup_ratio, F.lit(False)).alias(
            "repetitive"
        ),
    )


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails and phone numbers, keeping audit counts: emails →
    ``<EMAIL>``, phones → ``<PHONE>``. Row-local regexp work only; the
    redacted text is fingerprinted (md5) rather than carried wide so the
    result of a 100-TB redaction audit is a narrow table."""
    txt = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(txt, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        id_col,
        F.size(F.regexp_extract_all(txt, F.lit(EMAIL_RE), F.lit(0)))
        .alias("n_emails"),
        F.size(F.regexp_extract_all(txt, F.lit(PHONE_RE), F.lit(0)))
        .alias("n_phones"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    n-word shingle with an eval/benchmark set.

    100-TB shape: the benchmark shingle set is small → broadcast; corpus
    shingles are checked map-side against it, and only per-doc overlap
    counts (one row per contaminated doc) ever shuffle. The final left
    join keys on ``doc_id`` only — corpus text stays out of every
    Exchange."""
    bench_sh = (
        word_shingles(benchmark, n, text_col, id_col)
        .select("shingle")
        .distinct()
    )
    corp_sh = word_shingles(corpus, n, text_col, id_col)
    hits = (
        corp_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("n_overlap"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )
