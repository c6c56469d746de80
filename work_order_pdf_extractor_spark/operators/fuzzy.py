"""Fuzzy key matching: edit-distance-1 join via deletion-neighborhood
blocking (the published SymSpell scheme) + exact levenshtein verify.

The reference's semi-join is exact-key (``work_order_extractor.py:
1752-1767`` str/int double lookup); real extracted keys carry OCR/typo
noise, and the naive fuzzy fix — ``JOIN ON levenshtein(a, b) <= 1`` —
is a cross join. Deletion blocking makes it a hash join: two strings
within Damerau/Levenshtein distance 1 share a member of each other's
depth-1 deletion neighborhoods, so generating ``len(key)+1`` variants
per key (the key itself plus every single-character deletion) and
equi-joining on the variant yields a candidate set that provably
contains every distance-≤1 pair; one ``levenshtein`` per CANDIDATE
(never per cross pair) then verifies.

100-TB shape: work is O(rows × key_len) variant rows joined on a
well-distributed string key — no cross product, no skew (variants of
distinct keys rarely collide), and the verify predicate is JVM-side
(``F.levenshtein``, mirrored exactly by DuckDB's ``levenshtein``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def deletion_variants(col: F.Column) -> F.Column:
    """The key plus every single-character-deletion variant, distinct —
    built row-locally (transform over a sequence; no explode yet)."""
    dels = F.when(
        F.length(col) >= 1,
        F.transform(
            # guard: Spark's sequence(1, 0) counts DOWN (step defaults to
            # -1 when start > stop), so an empty key must short-circuit
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                F.substring(col, 1, i - 1),
                col.substr(i + 1, F.length(col)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.concat(F.array(col), dels))


def fuzzy_semi_join(
    probe: DataFrame,
    ref: DataFrame,
    probe_key: str,
    ref_key: str,
    id_col: str,
    max_dist: int = 1,
    broadcast_ref: bool = True,
) -> DataFrame:
    """For each probe row, the best reference key within ``max_dist``
    edits (ties broken by smaller distance, then lexicographic key), or
    no row if none. ``max_dist`` must be 1 — depth-1 deletion blocking
    is complete exactly for distance ≤ 1 (deeper neighborhoods would be
    needed beyond that, and the guarantee is the point).

    Plan shape: with ``broadcast_ref`` (the default — reference key sets
    are dim-sized even when the probe side is the 100-TB fact) the
    variant join is a BroadcastHashJoin, so the probe side is scanned
    once with NO shuffle before the verify; the only Exchange in the
    whole plan is the per-probe-id window at the end. Candidate pairs
    that arise from several shared deletion variants are deliberately
    NOT pre-deduplicated: a duplicate candidate costs one extra JVM
    ``levenshtein`` on a short key, while deduplicating it costs a full
    shuffle of the candidate set — the closing ``row_number() = 1``
    window already collapses duplicates for free. Set
    ``broadcast_ref=False`` only when the reference side is itself
    fact-sized (both sides then shuffle on the variant key)."""
    if max_dist != 1:
        raise ValueError("deletion blocking at depth 1 covers max_dist=1 only")
    # Hash-repartition the probe by its id BEFORE the explode, under the
    # same conf gate as the dedup family's fan-out. Two birds: (a) a
    # small probe that scans as one task (the sandbox shape — a 1.5 MB
    # parquet file never splits past Spark's 4 MB open-cost floor) fans
    # out to cluster parallelism before the explode/verify work, and
    # (b) because the partitioning is hashpartitioning(id), the closing
    # row_number window's Exchange is satisfied and ELIDED — the plan
    # carries exactly one probe-side shuffle, of bare pre-explode keys,
    # wherever it lands. At real scale the gate turns this off and the
    # only shuffle is the window over verified matches.
    from .common import FANOUT_CONF

    spark = probe.sparkSession
    pv = probe.select(id_col, F.col(probe_key).alias("pkey"))
    if spark.conf.get(FANOUT_CONF, "true").lower() == "true":
        pv = pv.repartition(
            spark.sparkContext.defaultParallelism, F.col(id_col)
        )
    # two-step select: aliasing a column and exploding a function of the
    # same alias in ONE select trips Spark 4's lateral-column-alias check
    pv = pv.withColumn("v", F.explode(deletion_variants(F.col("pkey"))))
    # dedupe reference keys BEFORE the variant explode: the shuffle (if
    # any) moves bare keys, not len(key)+1 variants per key, and
    # ``deletion_variants`` is already array_distinct within a key, so
    # (rkey, v) pairs are unique without a post-explode distinct
    rv = (
        ref.select(F.col(ref_key).alias("rkey"))
        .distinct()
        .withColumn("v", F.explode(deletion_variants(F.col("rkey"))))
    )
    if broadcast_ref:
        rv = F.broadcast(rv)
    cands = pv.join(rv, "v").select(id_col, "pkey", "rkey")
    verified = cands.withColumn(
        "dist", F.levenshtein("pkey", "rkey")
    ).filter(F.col("dist") <= max_dist)
    w = Window.partitionBy(id_col).orderBy(F.col("dist").asc(), F.col("rkey").asc())
    return (
        verified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            id_col,
            F.col("pkey").alias("probe_key"),
            F.col("rkey").alias("matched_key"),
            F.col("dist").cast("int").alias("dist"),
        )
    )
