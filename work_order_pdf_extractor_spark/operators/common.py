"""Shared leaf helpers for the operator families.

Deliberately a LEAF module (imports nothing package-internal): half the
operator modules need the fan-out gate, the cross-engine-stable hash, or
word shingling, and when those lived in ``dedup.py`` every such module
was transitively coupled to the whole dedup family (and, through one
function-local import there, to ``similarity.py``) — so an edit to ANY
ANN operator invalidated the attestation fingerprint of every text
query. Keeping these here keeps each query's dependency closure honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FANOUT_CONF = "spark.workorder.dedup.fanout.enabled"


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Fan a narrow input out to cluster parallelism before explode-heavy
    work. A single small parquet file scans as 1 task, and everything
    downstream of an explode inherits that parallelism until the first
    shuffle. Gated by the session conf ``spark.workorder.dedup.fanout.
    enabled`` (default true) — a per-session, runtime-settable switch
    rather than a mutable module global (ADVICE r2): at real scale, where
    the scan is already wider than the cluster, ``spark.conf.set(...,
    'false')`` removes the round-robin shuffle from every dedup/text
    operator at once and they run shuffle-free up to their aggregation.
    The gate avoids probing ``df.rdd.getNumPartitions()``, which forces a
    driver-side conversion of the analyzed plan on every call; what it
    shuffles when on is the pre-explode rows (id + text), one pass."""
    spark = df.sparkSession
    if spark.conf.get(FANOUT_CONF, "true").lower() != "true":
        return df
    target = min_parts or spark.sparkContext.defaultParallelism
    return df.repartition(target)


def stable_hash64(col: F.Column, seed: int | None = None) -> F.Column:
    """First 8 md5 hex chars → bigint; identical in Spark and DuckDB."""
    src = F.concat(F.lit(f"{seed}#"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(src), 1, 8), 16, 10).cast("long")


def word_shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct n-word shingles per document (the unit of near-dup
    comparison). Explode happens JVM-side from a split array."""
    words = ensure_parallelism(
        df.select(id_col, F.split(text_col, " ").alias("ws"))
    )
    sz = F.size("ws")
    idx = F.sequence(F.lit(0), sz - n)
    sh = words.filter(sz >= n).select(id_col, F.explode(idx).alias("i"), "ws")
    parts = [F.col("ws")[F.col("i") + k] for k in range(n)]
    return sh.select(
        id_col, F.concat_ws(" ", *parts).alias("shingle")
    ).distinct()
