"""Deduplication operators for large-scale training-data pipelines.

All operators take/return DataFrames and are pure DataFrame-API
compositions (JVM-side, codegen-friendly, no Python in the hot path).
Cross-engine-stable hashing (md5-hex → int) is used instead of engine-
native ``hash()`` so results are reproducible anywhere and oracle-checkable.

Scale notes per operator are in the docstrings — the common theme: never
join or shuffle raw text; join on hashes/signatures/buckets whose size is
independent of document length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .common import (  # noqa: F401  (re-exported: long-time import site)
    FANOUT_CONF,
    ensure_parallelism,
    stable_hash64,
)

# r7: every internal shingle derivation uses the vectorized twin — one
# Arrow pass with per-doc set semantics instead of explode + interpreted
# concat_ws + a full distinct shuffle; differential-tested identical to
# common.word_shingles (tests/test_shinglefast.py). The rebind keeps the
# long-standing `dedup.word_shingles` import site working.
from .shinglefast import word_shingles_fast as word_shingles  # noqa: F401

N_MINHASH = 8
LSH_BANDS = 4
SIMHASH_BITS = 16

# MinHash affine family constants (shared with the SQL oracles)
MH_P = 2305843009213693951  # 2^61 - 1


def MH_A(i: int) -> int:
    return 1000003 + 37 * i


def MH_B(i: int) -> int:
    return 12345 + 789 * i


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by content hash; keeps the smallest id as the keeper.
    One map-side-combined shuffle on a 32-char hash — the raw text never
    moves."""
    return (
        df.withColumn("content_hash", F.md5(text_col))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias(f"keeper_{id_col}"),
        )
    )


def deduplicate_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize the deduped corpus: keep exactly the keeper row of each
    exact-duplicate group (smallest id). Two shuffles on a 32-char hash —
    at 100 TB the semi-join back is a broadcast-free shuffle join on the
    hash, never on text."""
    keepers = exact_duplicates(df, text_col, id_col).select(
        F.col(f"keeper_{id_col}").alias(id_col)
    )
    return df.join(keepers, id_col, "left_semi")



def df_cut_shingles(sh: DataFrame, max_df: int) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_df`` — the
    standard MinHashLSH hygiene against stop phrases (SCALE.md's
    top-frequency-shingle hazard, now code instead of prose).

    ``sh`` must be distinct per (id, shingle) — the :func:`word_shingles`
    contract — since the frequency is a plain row count per shingle.

    Why it matters at 100 TB: a boilerplate phrase shared by millions of
    documents otherwise dominates their MinHash signatures, funnels them
    into the same LSH buckets, and makes the verify stage's per-bucket
    fan-out quadratic in the corpus — the exact skew the salting knobs
    exist to absorb. Cutting by df bounds every shingle's contribution to
    candidate generation at ``max_df`` docs, so the verify fan-out per
    shingle is ≤ max_df², independent of corpus size.

    Plan shape: one map-side-combined count per shingle followed by a
    semi-join back on the same key — the aggregate's shuffle partitioning
    is reused by the join, so the cut costs one extra shuffle on the
    (constant-size) shingle hash, never on text. Documents whose shingles
    are ALL hot drop out of signature generation entirely (they are pure
    boilerplate — exactly the rows near-dup candidates should not chase)."""
    keep = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("shingle")
    )
    return sh.join(keep, "shingle", "left_semi")


def _cooccurring_pairs(sh: DataFrame, id_col: str) -> DataFrame:
    """One (doc1, doc2) row per unordered co-occurrence per shingle —
    doc1 < doc2, from sorted per-shingle posting lists (r7). Hot
    shingles (corpus-wide phrases) are split into ≤1024-member chunks
    and every chunk pair is generated ROW-LOCALLY from the posting row
    (k = k1·nch + k2 index arithmetic — no self-join), then round-robin
    repartitioned, so a df-10⁴ shingle expands across many tasks
    instead of serializing 10⁸ pairs in one (guide §2.5). Sorted chunks
    make cross-chunk expansion ordered without a filter."""
    chunk = 1024
    par = sh.sparkSession.sparkContext.defaultParallelism
    lists = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    nch = F.ceil(F.size("ids") / chunk).cast("int")
    cp = (
        lists.select(
            "ids",
            nch.alias("nch"),
            F.explode(F.sequence(F.lit(0), nch * nch - 1)).alias("kk"),
        )
        .select(
            "ids",
            F.expr("kk div nch").cast("int").alias("k1"),
            F.pmod(F.col("kk"), F.col("nch")).cast("int").alias("k2"),
        )
        .filter(F.col("k1") <= F.col("k2"))
        .select(
            F.slice("ids", F.col("k1") * chunk + 1, chunk).alias("sub1"),
            F.slice("ids", F.col("k2") * chunk + 1, chunk).alias("sub2"),
            (F.col("k1") == F.col("k2")).alias("same"),
        )
        .repartition(par)
    )
    tri = (
        cp.filter("same")
        .select(F.posexplode("sub1").alias("i", "doc1"), "sub1")
        .select(
            "doc1",
            F.explode(
                F.slice("sub1", F.col("i") + 2, F.size("sub1"))
            ).alias("doc2"),
        )
    )
    cross = (
        cp.filter(~F.col("same"))
        .select(F.explode("sub1").alias("doc1"), "sub2")
        .select("doc1", F.explode("sub2").alias("doc2"))
    )
    return tri.unionByName(cross)


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
    shingles: DataFrame | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """n-gram Jaccard ≥ threshold — the VERIFICATION stage of a dedup
    pipeline.

    With ``candidates=None``: all-pairs via shingle self-join — exact but
    quadratic in the worst case, right only for small corpora or golden
    checks. With ``candidates`` (a ``(doc1, doc2)`` DataFrame, e.g. from
    :func:`minhash_lsh_pairs`): Jaccard is computed ONLY for those pairs —
    cost is Σ|shingles(doc1)| over candidate pairs, joined back on
    ``(doc2, shingle)``; never a shingle cross product. This is the 100 TB
    path (LSH prunes, Jaccard verifies). ``shingles`` lets a composed
    pipeline pass a shared (persisted/materialized) shingle table instead
    of re-deriving it per stage. ``max_df`` applies
    :func:`df_cut_shingles` first, making the score "Jaccard over rare
    shingles" — sizes and intersections both count only surviving
    shingles, so the metric stays a true Jaccard on the cut sets."""
    sh = (
        shingles
        if shingles is not None
        else word_shingles(df, n, text_col, id_col)
    )
    if max_df is not None:
        sh = df_cut_shingles(sh, max_df)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sizes.select(F.col(id_col).alias("doc1"), F.col("n_sh").alias("n1"))
    sb = sizes.select(F.col(id_col).alias("doc2"), F.col("n_sh").alias("n2"))
    if candidates is not None:
        # r7 LENGTH-RATIO PREFILTER (the classic size filter of the
        # similarity-join literature): Jaccard ≤ min(n1,n2)/max(n1,n2),
        # so J ≥ t requires min ≥ t·max — a candidate failing that can
        # never verify and is dropped BEFORE the candidate × shingle
        # expansion join (the measured 10× row amplification of the
        # verify stage). The 1e-9 slack makes float rounding err on the
        # over-keep side only; the closing jaccard filter is unchanged,
        # so the output is provably identical.
        c = (
            candidates.select("doc1", "doc2")
            .join(sa, "doc1")
            .join(sb, "doc2")
            .filter(
                F.least("n1", "n2")
                >= (F.lit(threshold) - F.lit(1e-9))
                * F.greatest("n1", "n2")
            )
        )
        s1 = sh.select(F.col(id_col).alias("doc1"), "shingle")
        s2 = sh.select(F.col(id_col).alias("doc2"), "shingle")
        # n1/n2 are functionally determined by (doc1, doc2) — carrying
        # them through the aggregation keys skips the tail's two size
        # re-joins entirely
        common = (
            c.join(s1, "doc1")
            .join(s2, ["doc2", "shingle"])
            .groupBy("doc1", "doc2", "n1", "n2")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        return (
            common.withColumn(
                "jaccard",
                F.round(
                    F.col("n_common")
                    / (F.col("n1") + F.col("n2") - F.col("n_common")),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("doc1", "doc2", "jaccard")
        )
    else:
        # r7 (guide §2.4/2.5): the all-pairs branch used a shingle
        # self-join — two probe passes over the same table and a
        # generated row per ORDERED pair that the a<b filter then
        # halved. Chunked posting-list expansion generates each
        # unordered co-occurrence exactly once with bounded per-task
        # fan-out: half the rows into the pair aggregation, no join
        # build, no hot-shingle straggler, identical counts.
        common = (
            _cooccurring_pairs(sh, id_col)
            .groupBy("doc1", "doc2")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    return (
        common.join(sa, "doc1")
        .join(sb, "doc2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    n_hashes: int = N_MINHASH,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per document: ``n_hashes`` min-hashes over the
    shingle set. Signature size is CONSTANT regardless of document length —
    the shuffle carries n_hashes longs per doc, which is what makes dedup
    tractable at 100 TB.

    One md5 per shingle; the hash family is affine re-hashing of that base
    (classic MinHash: ``h_i = (a_i·h + b_i) mod p``) — 8x fewer digest
    computations than per-seed hashing, still cross-engine-exact
    (a_i < 2^31, h < 2^32 ⇒ no 64-bit overflow; p = 2^61-1)."""
    sh = (
        shingles
        if shingles is not None
        else word_shingles(df, n, text_col, id_col)
    )
    base = stable_hash64(F.col("shingle"))
    aggs = [
        F.min((F.lit(MH_A(i)) * base + F.lit(MH_B(i))) % F.lit(MH_P)).alias(
            f"mh{i}"
        )
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def band_buckets(
    sig: DataFrame,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, bucket) rows from a MinHash signature table — ONE pass
    over the signatures: bands come from array+explode, not a union of
    per-band selects (a union would re-execute the whole shingle→minhash
    subtree once per band). Shared by the self-join candidate generator
    and the batch-vs-corpus incremental-ingest join."""
    rows_per_band = n_hashes // bands
    band_structs = []
    for b in range(bands):
        cols = [
            F.col(f"mh{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("_", *cols)).alias("bucket"),
            )
        )
    return sig.select(
        id_col, F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs(
    df: DataFrame,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """MinHash+LSH candidate pairs: signatures banded into ``bands`` groups;
    docs sharing any band bucket become candidates. The join key is a band
    hash — linear in corpus size, never quadratic.

    ``max_df`` drops shingles with document frequency > max_df before
    signatures (:func:`df_cut_shingles`): without it a corpus-wide stop
    phrase funnels unrelated documents into shared buckets and the verify
    fan-out goes quadratic; with it a shingle's candidate contribution is
    bounded at max_df² pairs."""
    sh = (
        shingles
        if shingles is not None
        else word_shingles(df, n, text_col, id_col)
    )
    if max_df is not None:
        sh = df_cut_shingles(sh, max_df)
    sig = minhash_signatures(df, n_hashes, n, text_col, id_col, shingles=sh)
    allb = band_buckets(sig, n_hashes, bands, id_col)
    a, b_ = allb.alias("a"), allb.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc1"), F.col(f"b.{id_col}").alias("doc2")
        )
        .distinct()
    )


def simhash(
    df: DataFrame,
    bits: int = SIMHASH_BITS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash fingerprint: bit j = sign of Σ over tokens of ±1 from the
    token hash's bit j. Near-duplicates differ in few bits; compare
    downstream with ``bit_count(a ^ b)``.

    Plan shape: ONE explode (tokens) and ONE aggregation with ``bits``
    per-bit sum expressions — not an explode over bits, which would blow
    the row count up ``bits``-fold before the shuffle (measured 3-4x
    slower at sf0.1)."""
    words = ensure_parallelism(df.select(id_col, F.col(text_col))).select(
        id_col, F.explode(F.split(text_col, " ")).alias("w")
    ).filter(F.col("w") != "")
    h = stable_hash64(F.col("w"))
    wb = words.select(id_col, h.alias("h"))
    per_bit = wb.groupBy(id_col).agg(
        *[
            F.sum(F.expr(f"CAST((h >> {b}) & 1 AS INT) * 2 - 1")).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return per_bit.select(id_col, sim.cast("long").alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, max_hamming: int = 2, bits: int = SIMHASH_BITS,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming, bucketed
    by half-fingerprint (pigeonhole: a pair within distance d shares at
    least one of d+1 segments, so segment-bucketing prunes the join)."""
    sh = simhash(df, bits, text_col, id_col)
    half = bits // 2
    segs = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("seg"), F.expr(f"simhash % {2**half}").alias("key")),
                F.struct(F.lit(1).alias("seg"), F.expr(f"simhash div {2**half}").alias("key")),
            )
        ).alias("s"),
    ).select(id_col, "simhash", F.col("s.seg").alias("seg"), F.col("s.key").alias("key"))
    a, b = segs.alias("a"), segs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc1"),
            F.col(f"b.{id_col}").alias("doc2"),
            F.col("a.simhash").alias("h1"),
            F.col("b.simhash").alias("h2"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(h1 ^ h2)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
    )


CMS_DEPTH = 4
CMS_WIDTH = 256


def countmin_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count–Min sketch as a DataFrame composition (Spark ships no CMS
    operator): ``depth`` md5-seeded hash rows of ``width`` counters; the
    frequency estimate for a key is the MIN of its ``depth`` counters.
    Never underestimates; overestimates by at most the collision mass of
    a 1/width-loaded row (the classic εN bound).

    Plan shape at 100 TB: the sketch BUILD is one map-side-combined
    groupBy over (row, bucket) — depth×width counters total, independent
    of corpus size — and the counter table broadcasts everywhere. The
    estimates here join each distinct key's ``depth`` buckets against
    that tiny table. Everything is md5-derived, so the estimate values
    are bit-identical in any engine — the oracle checks the ESTIMATES,
    not just a bound. Output: (key_col, exact_n, cms_n, never_under)."""
    buckets = [
        (stable_hash64(F.col(key_col).cast("string"), seed=i) % width).alias(
            f"b{i}"
        )
        for i in range(depth)
    ]
    hashed = df.select(F.col(key_col), *buckets)
    counters = None
    for i in range(depth):
        c = hashed.groupBy(F.col(f"b{i}").alias("bucket")).agg(
            F.count(F.lit(1)).alias("cnt")
        ).select(F.lit(i).alias("rw"), "bucket", "cnt")
        counters = c if counters is None else counters.unionByName(c)
    keys = hashed.groupBy(key_col, *[f"b{i}" for i in range(depth)]).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    probes = keys.select(
        key_col,
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("rw"), F.col(f"b{i}").alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, "exact_n", F.col("p.rw").alias("rw"), F.col("p.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(counters), ["rw", "bucket"])
        .groupBy(key_col, "exact_n")
        .agg(F.min("cnt").alias("cms_n"))
    )
    return est.select(
        key_col,
        "exact_n",
        "cms_n",
        (F.col("cms_n") >= F.col("exact_n")).alias("never_under"),
    )


def doc_embeddings(
    df: DataFrame,
    dims: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic hashed bag-of-words embedding per document: dimension
    ``j`` = Σ over tokens of ``(md5-hash(token, seed j) mod 1001) − 500``.
    Integer sums — order-independent, exactly reproducible in SQL — so the
    embedding is cross-engine-identical. Near-duplicate documents share
    almost all tokens, hence almost identical vectors (cosine → 1); this is
    the classic feature-hashing trick, not a learned model, which is what
    makes it oracle-checkable. One explode + one aggregation (``dims``
    sums), the same plan shape as :func:`simhash`."""
    words = (
        ensure_parallelism(df.select(id_col, text_col))
        .select(id_col, F.explode(F.split(text_col, " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    aggs = [
        F.sum((stable_hash64(F.col("w"), seed=j) % 1001) - 500).alias(f"e{j}")
        for j in range(dims)
    ]
    emb = words.groupBy(id_col).agg(*aggs)
    arr = F.array(*[F.col(f"e{j}").cast("double") for j in range(dims)])
    return emb.select(id_col, arr.alias("embedding"))


def embedding_near_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    dims: int = 16,
    n_planes: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Embedding-cosine near-dup: hashed-BoW embeddings → hyperplane-LSH
    buckets → within-bucket cosine ≥ threshold. The third near-dup family
    beside MinHash/Jaccard and SimHash; the join key is the LSH bucket, so
    the pair generation is linear-ish in corpus size (recall is the LSH
    tradeoff: near-identical vectors can straddle a bucket boundary on a
    near-zero projection). Output: (doc1, doc2, sim)."""
    from .similarity import _dot, _norm, hyperplane_lsh_buckets

    emb = doc_embeddings(df, dims, text_col, id_col)
    b = hyperplane_lsh_buckets(emb, n_planes, id_col, "embedding")
    withb = emb.join(b, id_col)
    a = withb.select(
        F.col(id_col).alias("doc1"), F.col("embedding").alias("qv"), "bucket"
    )
    c = withb.select(
        F.col(id_col).alias("doc2"), F.col("embedding").alias("nv"), "bucket"
    )
    sim = F.round(_dot("qv", "nv") / (_norm("qv") * _norm("nv")), 4)
    return (
        a.join(c, "bucket")
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 30,
    check_every: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components of the near-dup graph by the LARGE-STAR /
    SMALL-STAR alternation (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): each round rewires every node's neighborhood
    toward its local minimum, so component trees flatten geometrically —
    O(log N) rounds on ANY graph shape (a naive min-label propagation
    needs O(diameter) rounds, which a 200-node near-dup chain already
    defeats). Deterministic fixpoint: every node ends pointing at its
    component's minimum id. Output: ``(id_col, component_id)`` —
    singletons label themselves.

    This is the exact duplicate-CLUSTER semantics that the greedy
    keeper rule of :func:`deduplicate_near` approximates: under a chain
    a~b~c greedy and components agree on the keeper (min id), but
    components also give the cluster assignment itself, which training
    pipelines keep (cluster size features, one-per-cluster sampling).

    Per round: large-star — for each node u with m = min(Γ(u) ∪ {u}),
    connect every strictly-larger neighbor to m; small-star — on the
    downward-normalized edges, connect every ≤-neighbor and u itself to
    m. Each phase is one map-side-combinable min aggregation plus one
    hash join on node ids — O(|E|), never materializing neighborhoods
    driver-side. Driver round-trips are BATCHED: ``check_every`` rounds
    run as one lazy plan between eager ``localCheckpoint`` + convergence
    probes (count + order-free xxhash sum of the edge set; stable hash ⇒
    the star fixpoint — rounds are idempotent there — so the loop exits).
    ``stats['rounds']`` / ``stats['converged']`` report rounds actually
    executed and whether the fixpoint was reached; exhausting ``max_iter``
    before the fixpoint RAISES (labels at that point may still point at
    non-root nodes — silently returning them would hand the caller wrong
    components).

    Ids must be numeric (castable to long): the label algebra is min()
    over ids. A non-numeric string id would cast to NULL and silently
    drop edges, so the cast is guarded — any null-producing cast raises."""
    # checkpoint the cast edges ONCE so the (typically expensive) upstream
    # candidate-pair pipeline is never evaluated twice: both the null-cast
    # guard and the star loop read the checkpointed table
    ecast = edges.select(
        F.col("doc1").cast("long").alias("u"),
        F.col("doc2").cast("long").alias("v"),
        (F.col("doc1").isNotNull() & F.col("doc2").isNotNull()).alias("_nn"),
    ).localCheckpoint(eager=True)
    bad = ecast.filter(
        F.col("_nn") & (F.col("u").isNull() | F.col("v").isNull())
    ).first()
    if bad is not None:
        raise ValueError(
            "connected_components requires numeric (long-castable) ids; "
            "a non-numeric id cast to NULL would silently collapse the "
            "edge set"
        )
    e = (
        ecast.select("u", "v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    prev_probe = None
    converged = False
    while rounds < max_iter and not converged:
        for _ in range(min(check_every, max_iter - rounds)):
            # large-star: m over the FULL neighborhood (both directions)
            nb = e.unionByName(
                e.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            mins = nb.groupBy("u").agg(
                F.least(F.min("v"), F.first("u")).alias("m")
            )
            e = (
                nb.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct()
            )
            # small-star: downward edges only; u itself also re-points
            ee = e.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            mins2 = ee.groupBy("u").agg(F.min("v").alias("m"))
            e = (
                ee.join(mins2, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .unionByName(mins2.select("u", F.col("m").alias("v")))
                .filter(F.col("u") != F.col("v"))
                .distinct()
            )
            rounds += 1
        e = e.localCheckpoint(eager=True)
        probe = tuple(
            e.agg(
                F.count(F.lit(1)),
                # decimal sum: order-free AND overflow-free under ANSI
                # (a long sum of 64-bit hashes overflows immediately)
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            ).first()
        )
        converged = probe == prev_probe
        prev_probe = probe
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        raise RuntimeError(
            f"connected_components did not reach the star fixpoint in "
            f"max_iter={max_iter} rounds; labels would be unreliable "
            f"(raise max_iter — rounds needed is O(log N))"
        )
    # at the star fixpoint every non-root points straight at its root
    parents = e.groupBy("u").agg(F.min("v").alias("component_id"))
    return nodes.select(F.col(id_col).cast("long").alias("u")).join(
        parents, "u", "left"
    ).select(
        F.col("u").alias(id_col),
        F.coalesce("component_id", F.col("u")).alias("component_id"),
    )


def positioned_shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id, pos, shingle)`` — every n-word shingle WITH its start
    position, NOT deduplicated: the input for span-level analyses
    (repeated-span audit) where :func:`word_shingles`'s set semantics
    would lose the positions. r7: delegates to the vectorized twin
    (``shinglefast.positioned_shingles_fast``) — identical rows, no
    interpreted per-position concat."""
    from .shinglefast import positioned_shingles_fast

    return positioned_shingles_fast(df, n, text_col, id_col)


def repeated_spans(
    df: DataFrame,
    n: int = 3,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Repeated-span audit (the memorization-hazard metric behind
    substring-level training-data dedup, Lee et al. "Deduplicating
    Training Data Makes Language Models Better"): for each document,
    how many of its tokens are covered by an n-gram that occurs at
    least ``min_count`` times in the whole corpus (cross-document
    duplication AND within-document boilerplate both count — each is a
    span a model can memorize verbatim). Output:
    ``(id, n_tokens, n_repeated_tokens, repeated_frac)``.

    Plan shape at 100 TB: positioned shingles explode once; the
    occurrence count is a map-side-combined groupBy on the shingle (a
    constant-size key — raw text never shuffles beyond n words); the
    semi-join back reuses that partitioning; coverage is a bounded
    ``sequence(pos, pos+n-1)`` explode over only the REPEATED shingles
    (rare by construction in a clean corpus) followed by a distinct +
    count per doc. No pairs ever materialize — this audits span mass,
    not pair identity, which is what makes it linear where full
    substring dedup needs suffix arrays."""
    sh = positioned_shingles(df, n, text_col, id_col)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= min_count)
        .select("shingle")
    )
    rep = sh.join(hot, "shingle", "left_semi")
    covered = (
        rep.select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("p"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_repeated_tokens"))
    )
    toks = df.select(
        id_col,
        F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
    )
    return toks.join(covered, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_repeated_tokens", F.lit(0))
        .cast("long")
        .alias("n_repeated_tokens"),
        F.round(
            F.coalesce("n_repeated_tokens", F.lit(0)) / F.col("n_tokens"), 6
        ).alias("repeated_frac"),
    )


def containment_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup: shingle containment ``|A∩B| / |A|`` ≥
    threshold — the quote/subset detector Jaccard misses (a short doc
    fully quoted inside a long one scores near-zero Jaccard but
    containment 1.0; classic Broder resemblance-vs-containment).
    Output: ``(doc1, doc2, containment)`` where ``doc1`` is the
    CONTAINED document, both directions of every pair considered.

    Same candidate discipline as :func:`ngram_jaccard_pairs`: pass
    ``candidates`` (e.g. LSH pairs) at scale so the intersection join is
    restricted; the all-pairs self-join fallback is for small corpora
    and golden checks."""
    sh = (
        shingles
        if shingles is not None
        else word_shingles(df, n, text_col, id_col)
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    if candidates is not None:
        c = candidates.select("doc1", "doc2")
        both = c.unionByName(
            c.select(F.col("doc2").alias("doc1"), F.col("doc1").alias("doc2"))
        ).distinct()
        s1 = sh.select(F.col(id_col).alias("doc1"), "shingle")
        s2 = sh.select(F.col(id_col).alias("doc2"), "shingle")
        common = (
            both.join(s1, "doc1")
            .join(s2, ["doc2", "shingle"])
            .groupBy("doc1", "doc2")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        # r7: same chunked posting-list pair generation as the Jaccard
        # all-pairs branch — count each unordered pair once, then mirror
        # (the intersection is symmetric), instead of a self-join that
        # aggregates both directions independently.
        half = (
            _cooccurring_pairs(sh, id_col)
            .groupBy(
                F.col("doc1").alias("d1"), F.col("doc2").alias("d2")
            )
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        common = half.select(
            F.col("d1").alias("doc1"), F.col("d2").alias("doc2"), "n_common"
        ).unionByName(
            half.select(
                F.col("d2").alias("doc1"), F.col("d1").alias("doc2"), "n_common"
            )
        )
    sa = sizes.select(F.col(id_col).alias("doc1"), F.col("n_sh").alias("n1"))
    return (
        common.join(sa, "doc1")
        .withColumn(
            "containment", F.round(F.col("n_common") / F.col("n1"), 6)
        )
        .filter(F.col("containment") >= threshold)
        .select("doc1", "doc2", "containment")
    )


def deduplicate_near(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.6,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end near-dup dedup — the query a training-data user actually
    runs. Three stages, each linear-ish at 100 TB:

    1. CANDIDATES: :func:`minhash_lsh_pairs` — banded LSH join on band
       hashes (constant-size signatures; never an all-pairs join).
    2. VERIFY: :func:`ngram_jaccard_pairs` restricted to the candidates —
       exact Jaccard only where LSH says "maybe".
    3. KEEP: greedy keeper rule — drop every doc that is the larger id of
       a verified pair (``doc2``); keep the rest. Under a chain a~b~c this
       keeps only ``a`` — the standard greedy canonicalization. (Exact
       duplicate-cluster semantics would need iterative min-id propagation
       / connected components; greedy is one anti-join, deterministic, and
       what production dedup pipelines ship.)

    Returns the deduped corpus with the original schema.

    The shingle table feeds FOUR consumers here (minhash signatures, the
    size dim, both sides of the verify join); it is computed once and
    persisted — the local-mode analog of materializing the shingle/
    signature table that a 100 TB dedup keeps as its own dataset rather
    than re-deriving per stage. The cache block stays registered until
    Spark's LRU evicts it (or the caller unpersists); at real scale the
    materialization is an explicit intermediate TABLE with its own
    lifecycle, not executor cache."""
    sh = word_shingles(df, n, text_col, id_col).persist()
    cand = minhash_lsh_pairs(
        df, n_hashes, bands, n, text_col, id_col, shingles=sh
    )
    verified = ngram_jaccard_pairs(
        df, n, threshold, text_col, id_col, candidates=cand, shingles=sh
    )
    dupes = verified.select(F.col("doc2").alias(id_col)).distinct()
    return df.join(dupes, id_col, "left_anti")
