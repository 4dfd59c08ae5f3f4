"""Deduplication operators `[EXT]` — exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup (BASELINE.json mandate).

Scale design notes (the 100 TB story per operator):
- **exact**: fingerprint (md5 of normalized text) → groupBy min(doc_id).
  One shuffle on a 16-byte key; partial aggregation makes it map-heavy.
- **MinHash + LSH**: shingle → 32-bit portable hash → k permutations
  h_i(x) = (A_i·x + B_i) mod P → signature → bands → bucket join.
  All-pairs comparison never happens: candidate pairs only form inside
  an LSH bucket (band-hash equality join — a shuffle on band keys whose
  fan-out is controlled by band width).
- **SimHash**: 32-bit fingerprint from sign-summed token hashes; near-dup
  = small Hamming distance, candidates bucketed by fingerprint bands.
- **n-gram Jaccard**: exact verification on candidate pairs (explode →
  intersection count ÷ union) — the verifier AFTER LSH narrows
  candidates: the classic two-phase near-dedup pipeline.
- **embedding cosine**: exact cosine over candidate pairs; all-pairs at
  oracle scale, LSH/IVF-bucketed at production scale (similarity.py).

Every hash is the md5-derived `portable_hash`, so each pipeline has an
exact DuckDB SQL twin (queries_ext.py) and the driver can hash-check
results — RNG-free, engine-independent determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.functions.distance import cosine_similarity
from write_optimized_vector_database_spark.functions.hashing import portable_hash
from write_optimized_vector_database_spark.operators.textops import fingerprint, normalize_text, tokens

# MinHash permutations h_i(x) = (A_i·x + B_i) mod P over the 32-bit
# shingle-hash universe. P = 2^31-1 (Mersenne prime). A_i odd, small —
# products stay < 2^48, exact in BIGINT arithmetic in both engines.
MINHASH_P = 2_147_483_647


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    return [(2 * i + 3, 7 * i + 1) for i in range(num_hashes)]


# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Distinct character n-grams of normalized text (array<string>).
    substring over a generated index sequence — exact SQL twin exists."""
    norm = normalize_text(col)
    starts = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(starts, lambda i: F.substring(norm, i, n)))


def shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """(doc_id, sh) — exploded distinct n-gram 32-bit portable hashes.

    Repartitions the input first: shingling is CPU-bound per row, and a
    small corpus often arrives as one file → one partition → one core.
    At cluster scale the input is already many splits and this coalesces
    to a no-op-sized shuffle of the (tiny) id+text columns.
    """
    spark = docs.sparkSession
    docs = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    return docs.select(
        "doc_id",
        F.explode(char_shingles("__text", n)).alias("shingle"),
    ).select("doc_id", portable_hash("shingle").alias("sh"))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup groups: fingerprint → representative = min(doc_id) +
    group size. One hash-shuffle; map-side partial aggregation."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("representative"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def dedup_keep_first(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-dedup filter: keep the lowest-id doc per fingerprint group."""
    w = Window.partitionBy(fingerprint(text_col)).orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, h0..h{k-1}) MinHash signature — min over shingles of each
    permuted hash. Computed as one explode + groupBy with k mins: a
    single shuffle on doc_id regardless of k."""
    sh = shingle_hashes(docs, id_col, text_col, n)
    # one shuffle on doc_id computes all k mins together
    aggs = [
        F.min((F.col("sh") * a + b) % MINHASH_P).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def banded_keys(
    signatures: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(doc_id, band, key) — each doc exploded into its `bands` LSH band
    keys (key = concatenated signature slice). The shared front half of
    the candidate join and the bucket-skew telemetry below."""
    rows_per_band = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    return signatures.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", "bk.band", "bk.key"
    )


def lsh_bucket_stats(
    signatures: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Band-bucket size distribution — THE skew risk of banded LSH at
    scale: the candidate join's cost is Σ |bucket|², so one degenerate
    bucket (template-heavy corpus, low-entropy band) quadratically
    dominates the shuffle. One groupBy over the banded keys + one 1-row
    agg; returns (n_buckets, max_bucket, p99_bucket, avg_bucket,
    sum_sq_buckets). Run it before a big dedup job: a max_bucket in the
    tens of thousands says shard that key or drop the band."""
    sizes = banded_keys(signatures, num_hashes, bands).groupBy("band", "key").count()
    return sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("count").alias("max_bucket"),
        F.percentile_approx("count", 0.99).alias("p99_bucket"),
        F.avg("count").alias("avg_bucket"),
        F.sum(F.col("count") * F.col("count")).alias("sum_sq_buckets"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs sharing ≥1 LSH band. Band key =
    concatenated signature slice; the self-join is an equality join on
    (band_idx, band_key) — shuffle-bounded by bucket sizes, never
    all-pairs."""
    banded = (
        banded_keys(signatures, num_hashes, bands)
        # self-joined below — persist so the signature pipeline (shingle
        # explode + k mins) computes once, not once per join side
        .persist()
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_jaccard_estimate(
    signatures: DataFrame, pairs: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """Estimated Jaccard = fraction of matching signature components."""
    sa = signatures.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_hashes)],
    )
    sb = signatures.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_hashes)],
    )
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(num_hashes)
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (matches / F.lit(num_hashes)).alias("jaccard_est"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verification)
# ---------------------------------------------------------------------------


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard over distinct n-gram sets for given candidate pairs:
    |A∩B| via a shingle equality join, |A∪B| = |A|+|B|-|A∩B|."""
    # shingles feed three consumers (sizes + both join sides) — persist
    # so the explode/hash pipeline runs once
    sh = shingle_hashes(docs, id_col, text_col, n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("__doc_b"), F.col("sh").alias("sh_b"))
    inter = (
        pairs.join(sa, "doc_a")
        .join(
            sb,
            (F.col("doc_b") == F.col("__doc_b")) & (F.col("sh_a") == F.col("sh_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.coalesce(F.col("n_inter"), F.lit(0))
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0)))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash) — 32-bit fingerprint: bit b set iff the sum over
    distinct tokens of ±1 (by token-hash bit b) is positive. Built as a
    token explode + 32 conditional sums: one shuffle on doc_id."""
    spark = docs.sparkSession
    tok = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", F.explode(F.array_distinct(tokens("__text"))).alias("tok"))
        .select("doc_id", portable_hash("tok").alias("th"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    fp = sum(
        F.when(F.col(f"s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        for b in range(SIMHASH_BITS)
    )
    return agg.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_near_pairs(
    sim: DataFrame, max_hamming: int = 3, prefix_bits: int = 8
) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ max_hamming. Candidates are
    bucketed by the fingerprint's high `prefix_bits` (docs differing only
    in low bits collide), then verified with bit_count(xor) — at scale
    use multiple rotated prefix tables; one table here."""
    pre = sim.withColumn(
        "bucket", F.shiftright(F.col("simhash"), SIMHASH_BITS - prefix_bits)
    )
    a = pre.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"), "bucket"
    )
    b = pre.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"), "bucket"
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_by: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine ≥ threshold.

    With `bucket_by` (a (id, bucket) DataFrame, e.g. IVF centroid
    assignment), pairs form only within buckets — the ANN-bucketed
    near-dup join used at scale. Without it, all-pairs (oracle scale).

    Norms are precomputed per side (O(n) folds) so each pair costs one
    dot-product fold instead of three; bit-identical to computing
    ip/(sqrt(ip(a,a))·sqrt(ip(b,b))) per pair."""
    from write_optimized_vector_database_spark.functions.distance import dot_product, l2_norm

    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), l2_norm(vec_col).alias("na")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), l2_norm(vec_col).alias("nb")
    )
    if bucket_by is not None:
        ba = bucket_by.select(F.col("id").alias("id_a"), "bucket")
        bb = bucket_by.select(F.col("id").alias("id_b"), "bucket")
        pairs = (
            a.join(ba, "id_a")
            .join(bb.join(b, "id_b"), "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
        )
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    denom = F.col("na") * F.col("nb")
    cosine = F.when(denom == 0.0, F.lit(0.0)).otherwise(
        dot_product("va", "vb") / denom
    )
    return pairs.select("id_a", "id_b", cosine.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster connected components
# ---------------------------------------------------------------------------


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs → (id, cluster_id).

    Near-dup detection emits PAIRS; dedup policy needs CLUSTERS (the
    transitive closure: if a~b and b~c, keep one of {a,b,c}). This is
    the component-labeling step the reference's dedup story implies but
    pair queries alone can't express.

    Iterative min-label propagation: every node starts labeled with its
    own id; each round every node takes the min label in its closed
    neighborhood. Converges in O(component diameter) rounds — near-dup
    clusters are short-diameter by construction (they form inside LSH
    buckets), so the loop exits after 2-3 rounds in practice, bounded by
    `max_iter`. Each round is ONE shuffle over the EDGE set (candidate
    pairs only — tiny vs the corpus), so the 100 TB cost is
    O(rounds × |pairs|), never O(n²). For adversarially long chains,
    swap in alternating large-star/small-star (Kiveris et al., "CC in
    MapReduce and Beyond") — same join shape, fewer rounds.

    The cluster_id is the component's min member id — deterministic, so
    the result is hash-checkable against a recursive-CTE oracle.
    """
    # Iterative plans grow lineage per round; localCheckpoint truncates
    # the DAG each iteration (persist alone keeps the nested plan and
    # blows up Catalyst/codegen on long chains).
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select("id", F.least("label", "nlabel").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    out = labels.select("id", F.col("label").alias("cluster_id"))
    edges.unpersist()
    return out


def semantic_dedup(
    emb: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup scale path (Abbas et al. 2023): bucket by nearest
    centroid, call cosine ≥ threshold within a bucket semantic
    duplicates, close them into components, keep the member LEAST
    similar to its bucket centroid (max-diversity keep rule). Returns
    (cluster_id, cluster_size, keep_id, keep_centroid_cosine).

    This is the PRODUCTION twin of the hash-checked registry query
    `emb_semantic_dedup_keep_best`: the caller supplies centroids
    (k-means with nlist ∝ corpus/target_bucket keeps bucket sizes
    CONSTANT as the corpus grows → pair mass O(n)), and assignment is
    the Arrow/BLAS argmin — O(n·nlist) matmul flops. The registry query
    instead uses stride centroids + the bit-exact JVM fold assignment so
    DuckDB hash-equality holds; that witness path is O(n²/stride) BY
    DESIGN and must not be soaked (measured: exponent 1.58 at ×10 —
    docs/SCALE.md "Semantic dedup" row)."""
    from write_optimized_vector_database_spark.functions.distance import (
        dot_product,
        l2_norm,
    )
    from write_optimized_vector_database_spark.operators.ivf import assign_centroids

    embd = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    )
    assigned = assign_centroids(embd, centroids, vec_col="embedding")
    buckets = assigned.select(
        F.col("vec_id").alias("id"), F.col("centroid_id").alias("bucket")
    )
    pairs = embedding_near_dup_pairs(
        embd, threshold=threshold, id_col="vec_id", vec_col="embedding",
        bucket_by=buckets,
    )
    comp = dedup_clusters(pairs, "id_a", "id_b")
    scored = (
        comp.join(assigned, comp["id"] == assigned["vec_id"])
        .join(centroids, "centroid_id")
        .select(
            "cluster_id",
            "vec_id",
            (
                dot_product("embedding", "centroid")
                / (l2_norm("embedding") * l2_norm("centroid"))
            ).alias("cos_c"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("cos_c").asc(), F.col("vec_id").asc()
    )
    sizes = scored.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(sizes, "cluster_id")
        .select(
            "cluster_id",
            "cluster_size",
            F.col("vec_id").alias("keep_id"),
            F.col("cos_c").alias("keep_centroid_cosine"),
        )
    )
