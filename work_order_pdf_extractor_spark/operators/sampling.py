"""Deterministic corpus sampling and sequence packing — the selection /
layout stage of a training-data pipeline (after dedup & quality filtering,
before tokenized shards are written).

All operators are pure DataFrame compositions with CROSS-ENGINE-STABLE
randomness: "random" decisions are md5-hash thresholds of stable keys, so
results are reproducible across engines, partitionings and reruns (no RNG
state), and the DuckDB oracles replay them exactly. That property is not a
test convenience — reproducible selection is what makes a 100 TB corpus
build auditable and resumable (a re-run selects the same rows, so partial
output can be trusted).

Scale notes:
- sampling/splitting are stateless row-local predicates — zero shuffle,
  fully pushdown-friendly.
- packing needs a running total, which is sequential BY DESIGN; it is
  parallelized the way production packers are: per shard (here the
  ``source`` column) — each shard's cumsum is an independent window, so
  the plan is one hash-partition shuffle on the shard key, never a global
  single-partition sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .common import stable_hash64

# hash-threshold resolution: fractions are quantized to 1/10000
_RES = 10_000


def _bucket(key: F.Column) -> F.Column:
    """Deterministic uniform bucket in [0, _RES) from a stable key —
    md5-derived (first 8 hex chars), so Spark and DuckDB agree bit-for-bit
    (engine-native hash() would not be reproducible elsewhere)."""
    return F.pmod(stable_hash64(key), F.lit(_RES))


def stratified_sample(
    df: DataFrame,
    fraction: float,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of each stratum: a row survives
    iff its hash bucket clears the threshold. Per-stratum rates are equal
    by construction (the hash key includes the stratum, so buckets are
    uniform WITHIN each stratum), unlike a global Bernoulli sample which
    under-represents small strata by chance. Row-local predicate — no
    shuffle, survives pushdown."""
    key = F.concat_ws("#", F.col(strata_col), F.col(id_col).cast("string"))
    return df.filter(_bucket(key) < int(fraction * _RES))


def mix_corpus(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted domain mixing (the static-mixture step of published
    data-recipe work): subsample each domain so the OUTPUT follows the
    target ``weights``, keeping as many rows as the scarcest domain
    allows.

    The largest achievable corpus is ``T = min_s(n_s / w_s)`` (the
    binding domain is kept whole); every other domain keeps the
    deterministic fraction ``w_s·T / n_s`` via the same md5-threshold
    rule as :func:`stratified_sample`. Two passes at any scale: one
    cheap count per domain (broadcast back as a threshold literal), one
    row-local filter — the corpus itself never shuffles. Domains absent
    from ``weights`` are dropped (weight 0). Expected output mix is
    exact up to hash-bucket quantization (1/10000), verified in tests.

    Output adds ``keep_frac`` (the per-domain acceptance fraction) for
    auditability."""
    counts = {
        r[domain_col]: r["n"]
        for r in df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[domain_col] in weights
    }
    if not counts:
        return df.filter(F.lit(False)).withColumn("keep_frac", F.lit(0.0))
    total = sum(weights[s] for s in sorted(counts))  # fixed fold order
    norm = {s: weights[s] / total for s in counts}
    t_max = min(counts[s] / norm[s] for s in counts)
    fracs = {s: (norm[s] * t_max) / counts[s] for s in counts}
    key = F.concat_ws("#", F.col(domain_col), F.col(id_col).cast("string"))
    thresh = F.lit(None).cast("int")
    expr = None
    for s, frac in sorted(fracs.items()):
        cond = F.col(domain_col) == s
        val = F.lit(int(frac * _RES))
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    thresh = expr.otherwise(F.lit(-1))  # unknown domain -> keep nothing
    return (
        df.withColumn("_thresh", thresh)
        .filter(_bucket(key) < F.col("_thresh"))
        .drop("_thresh")
        .withColumn(
            "keep_frac",
            F.round(
                sum(
                    F.when(F.col(domain_col) == s, F.lit(frac)).otherwise(0.0)
                    for s, frac in sorted(fracs.items())
                ),
                6,
            ),
        )
    )


def train_test_split(
    df: DataFrame,
    train_fraction: float = 0.8,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/test assignment by id hash: stable across runs
    and engines (a re-shuffled corpus yields the SAME split — leakage-safe,
    because membership depends on the id, not on row order or partition).
    Adds ``split_col`` ∈ {'train', 'test'}."""
    b = _bucket(F.col(id_col).cast("string"))
    return df.withColumn(
        split_col,
        F.when(b < int(train_fraction * _RES), F.lit("train")).otherwise(
            F.lit("test")
        ),
    )


def pack_chunks(
    df: DataFrame,
    budget: int,
    shard_col: str = "source",
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style sequence packing: per shard, documents are concatenated in
    a stable order and cut into fixed ``budget``-token chunks (documents
    straddle chunk boundaries, as in pretraining packers). Output: one row
    per (document, chunk) overlap::

        (shard, chunk_id, id, doc_off, chunk_off, n_tok)

    ``doc_off``  = first packed token's offset within the document,
    ``chunk_off`` = its offset within the chunk, ``n_tok`` = tokens of this
    document in this chunk; per-chunk ``sum(n_tok) == budget`` for all but
    each shard's last chunk (asserted in tests).

    Plan: ONE window (partitionBy shard, orderBy order_col) for the running
    prefix, then arithmetic + ``sequence``/``explode`` over the spanned
    chunk range. The running total is sequential per shard by design —
    that is the packing semantics — and parallel ACROSS shards, which is
    how production packers scale (shard first, pack within shards). Empty
    documents (0 tokens) are dropped: they occupy no chunk space."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.col(token_col).cast("long")
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    prepped = (
        df.filter(t > 0)
        .select(
            F.col(shard_col).alias("shard"),
            F.col(id_col).alias("id"),
            t.alias("_tok"),
            before.alias("_before"),
        )
        .withColumn("_first", F.floor(F.col("_before") / budget))
        .withColumn(
            "_last", F.floor((F.col("_before") + F.col("_tok") - 1) / budget)
        )
    )
    exploded = prepped.select(
        "shard",
        "id",
        "_tok",
        "_before",
        F.explode(F.sequence("_first", "_last")).alias("chunk_id"),
    )
    tok_start = F.greatest(F.col("chunk_id") * budget, F.col("_before"))
    tok_end = F.least(
        (F.col("chunk_id") + 1) * budget, F.col("_before") + F.col("_tok")
    )
    return exploded.select(
        "shard",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        "id",
        (tok_start - F.col("_before")).cast("int").alias("doc_off"),
        (tok_start - F.col("chunk_id") * budget).cast("int").alias("chunk_off"),
        (tok_end - tok_start).cast("int").alias("n_tok"),
    )
