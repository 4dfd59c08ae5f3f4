"""Dedup + text-analysis query registrations `[EXT]` with DuckDB twins.

Every pipeline is RNG-free (md5-derived portable hashes, fixed MinHash
permutation constants), so the full MinHash-LSH / SimHash / Jaccard /
cosine near-dup pipelines are hash-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators import dedup as D
from write_optimized_vector_database_spark.operators import textops as TX
from write_optimized_vector_database_spark.queries import register
from write_optimized_vector_database_spark.sources.tables import load_table

# 2 bands × 8 rows: collision prob = 1-(1-s^8)^2 — selective enough that
# the candidate set stays near-dup-shaped even on a small-vocab corpus
# where 4×4 banding floods buckets (measured 5× fewer candidates at sf0.1)
_NUM_HASHES, _BANDS, _SHINGLE_N = 16, 2, 5

# Bounded signature cache (ADVICE r03: persisted signatures used to leak —
# four registry queries each persisted their own copy and never released
# it, accumulating cached partitions across a long driver run). One slot:
# a repeat call with the same (corpus, sf_dir) key inside one session
# reuses the persisted signatures; any new key unpersists the old entry
# first, so at most one signature set is ever cached.
_SIG_CACHE: dict = {}


def _session_token(spark_session) -> str:
    """Stable session identity (ADVICE r04: `id(session)` is a CPython
    object address — reusable after GC, so a new session could collide
    with a dead one's cache key and be handed a DataFrame bound to a
    stopped session). applicationId is unique per SparkContext."""
    try:
        return spark_session.sparkContext.applicationId
    except Exception:  # noqa: BLE001 — stopped context
        return f"dead-{id(spark_session)}"


def _fixture_token(key: tuple) -> tuple:
    """Append the fixture's mtime so a regenerated sf_dir mid-session
    invalidates cached signatures instead of serving stale ones."""
    import os

    toks = []
    for part in key:
        if isinstance(part, str) and os.path.isdir(part):
            p = os.path.join(part, "documents.parquet")
            try:
                toks.append(int(os.path.getmtime(p)))
            except OSError:
                toks.append(-1)
    return key + tuple(toks)


_SIG_CACHE_SLOTS = 4


def _persisted(spark_session, key: tuple, build) -> DataFrame:
    """Bounded keyed persist (LRU, ≤4 slots): the registry uses exactly
    three signature corpora per sf_dir (docs / cluster_corpus /
    tailed_corpus), so four slots hold a whole bench run with zero
    rebuilds (VERDICT r04 #5: the one-slot cache evicted `docs` when the
    cluster queries ran, re-shingling on the next docs query), while the
    bound still prevents the unreleased-persist accumulation ADVICE r03
    flagged. dict preserves insertion order; re-insert on hit = LRU."""
    key = (_session_token(spark_session),) + _fixture_token(key)
    cached = _SIG_CACHE.pop(key, None)
    if cached is not None:
        _SIG_CACHE[key] = cached  # most-recently-used position
        return cached
    while len(_SIG_CACHE) >= _SIG_CACHE_SLOTS:
        oldest = next(iter(_SIG_CACHE))
        try:
            _SIG_CACHE.pop(oldest).unpersist()
        except Exception:  # noqa: BLE001 — a dead session's cache entry
            pass
    built = build().persist()
    _SIG_CACHE[key] = built
    return built


def _persisted_signatures(docs_df: DataFrame, key: tuple) -> DataFrame:
    return _persisted(
        docs_df.sparkSession,
        ("sig",) + key,
        lambda: D.minhash_signatures(docs_df, _NUM_HASHES, _SHINGLE_N),
    )

# Shared DuckDB CTE: doc shingle hashes (distinct char-5-grams → 32-bit
# portable hash). `range` is non-lateral in DuckDB 1.0, so cross-join a
# fixed index range and filter (docs are ≤ ~4k chars in the fixtures).
_SHINGLE_CTE = rf"""
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, substring(t, i::INT, {_SHINGLE_N}) AS shingle
  FROM norm, range(1, 100001) r(i)
  WHERE i <= greatest(length(t) - {_SHINGLE_N - 1}, 1)
),
shh AS (
  SELECT doc_id, ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS s FROM sh
)
"""

_SIG_SELECT = ", ".join(
    f"min((s*{a}+{b})%{D.MINHASH_P}) AS h{i}"
    for i, (a, b) in enumerate(D.minhash_params(_NUM_HASHES))
)

_ROWS_PER_BAND = _NUM_HASHES // _BANDS
_BAND_CASE = " ".join(
    f"WHEN {b} THEN " + "||'_'||".join(
        f"h{b * _ROWS_PER_BAND + r}::VARCHAR" for r in range(_ROWS_PER_BAND)
    )
    for b in range(_BANDS)
)

_LSH_CTE = f"""
sig AS (SELECT doc_id, {_SIG_SELECT} FROM shh GROUP BY doc_id),
bands AS (
  SELECT doc_id, b.b::INT AS band, CASE b.b {_BAND_CASE} END AS key
  FROM sig, range({_BANDS}) b(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# Exact dedup (on a corpus with synthesized duplicates)
# ---------------------------------------------------------------------------


@register(
    "doc_exact_dedup",
    oracle=r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0
),
fps AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
  FROM corpus
)
SELECT fp, min(doc_id) AS representative, count(*) AS group_size
FROM fps GROUP BY fp
""",
    survey_ref="[EXT] dedup-exact",
    tags=["dedup", "text"],
)
def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over documents ∪ a shifted copy of every 3rd doc —
    verifies fingerprint grouping picks the original as representative."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return D.exact_dedup(docs.unionByName(dupes))


@register(
    "doc_dedup_keep_first",
    oracle=r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0
),
fps AS (
  SELECT doc_id, text,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
  FROM corpus
)
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rn
  FROM fps
) WHERE rn = 1
""",
    survey_ref="[EXT] dedup-exact",
    tags=["dedup", "text"],
)
def doc_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated-corpus view: only original doc_ids survive."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return D.dedup_keep_first(docs.unionByName(dupes)).select("doc_id")


# ---------------------------------------------------------------------------
# MinHash signatures / LSH candidates / Jaccard verification
# ---------------------------------------------------------------------------


@register(
    "doc_minhash_lsh_near_dup",
    oracle=f"""
WITH {_SHINGLE_CTE.strip()},
{_LSH_CTE.strip()},
est AS (
  SELECT c.doc_a, c.doc_b,
         ({" + ".join(f"(sa.h{i} = sb.h{i})::INT" for i in range(_NUM_HASHES))})::DOUBLE
           / {_NUM_HASHES} AS jaccard_est
  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
              JOIN sig sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard_est, rank FROM (
  SELECT *, row_number() OVER (ORDER BY jaccard_est DESC, doc_a ASC, doc_b ASC) AS rank
  FROM est
) WHERE rank <= 50
""",
    survey_ref="[EXT] dedup-minhash-lsh",
    tags=["dedup", "text", "lsh"],
)
def doc_minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash→LSH→estimate pipeline: top-50 candidate pairs by
    estimated Jaccard. All-pairs never materializes — candidates only
    form inside LSH band buckets."""
    docs = _docs(spark, sf_dir)
    # signatures feed the band join AND both estimate sides — persist once
    sig = _persisted_signatures(docs, ("docs", sf_dir))
    pairs = D.lsh_candidate_pairs(sig, _NUM_HASHES, _BANDS)
    est = D.minhash_jaccard_estimate(sig, pairs, _NUM_HASHES)
    from write_optimized_vector_database_spark.operators.topk import ranked_top_n

    return ranked_top_n(
        est,
        [F.col("jaccard_est").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()],
        50,
    ).withColumn("rank", F.col("rank").cast("long"))


@register(
    "doc_ngram_jaccard_verify",
    oracle=f"""
WITH {_SHINGLE_CTE.strip()},
{_LSH_CTE.strip()},
est AS (
  SELECT c.doc_a, c.doc_b,
         ({" + ".join(f"(sa.h{i} = sb.h{i})::INT" for i in range(_NUM_HASHES))})::DOUBLE
           / {_NUM_HASHES} AS jaccard_est
  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
              JOIN sig sb ON sb.doc_id = c.doc_b
),
shortlist AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b,
           row_number() OVER (ORDER BY jaccard_est DESC, doc_a ASC, doc_b ASC) AS rn
    FROM est
  ) WHERE rn <= 200
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM shortlist c
  JOIN shh a ON a.doc_id = c.doc_a
  JOIN shh b ON b.doc_id = c.doc_b AND b.s = a.s
  GROUP BY c.doc_a, c.doc_b
),
jac AS (
  SELECT c.doc_a, c.doc_b,
         COALESCE(i.n_inter, 0)::DOUBLE
           / (za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0)) AS jaccard
  FROM shortlist c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes za ON za.doc_id = c.doc_a
  JOIN sizes zb ON zb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard, rank FROM (
  SELECT *, row_number() OVER (ORDER BY jaccard DESC, doc_a ASC, doc_b ASC) AS rank
  FROM jac
) WHERE rank <= 50
""",
    survey_ref="[EXT] dedup-ngram-jaccard",
    tags=["dedup", "text"],
)
def doc_ngram_jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage near-dedup pipeline: LSH candidates → MinHash-estimate
    shortlist (top-200) → exact n-gram Jaccard verification. The exact
    stage — the expensive one — only ever sees a bounded shortlist."""
    docs = _docs(spark, sf_dir)
    sig = _persisted_signatures(docs, ("docs", sf_dir))
    pairs = D.lsh_candidate_pairs(sig, _NUM_HASHES, _BANDS)
    est = D.minhash_jaccard_estimate(sig, pairs, _NUM_HASHES)
    from write_optimized_vector_database_spark.operators.topk import ranked_top_n

    shortlist = est.orderBy(
        F.col("jaccard_est").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()
    ).limit(200).select("doc_a", "doc_b")
    jac = D.ngram_jaccard(docs, shortlist, _SHINGLE_N)
    return ranked_top_n(
        jac,
        [F.col("jaccard").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()],
        50,
    ).withColumn("rank", F.col("rank").cast("long"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_SUMS = ", ".join(
    f"sum(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(D.SIMHASH_BITS)
)
_SIMHASH_FP = " + ".join(
    f"(CASE WHEN s{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(D.SIMHASH_BITS)
)


@register(
    "doc_simhash_fingerprints",
    oracle=rf"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
  FROM documents
),
th AS (
  SELECT doc_id, ('0x' || substring(md5(t), 1, 8))::BIGINT AS th FROM tok
),
sums AS (SELECT doc_id, {_SIMHASH_SUMS} FROM th GROUP BY doc_id)
SELECT doc_id, ({_SIMHASH_FP})::BIGINT AS simhash FROM sums
""",
    survey_ref="[EXT] dedup-simhash",
    tags=["dedup", "text"],
)
def doc_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprint per document."""
    return D.simhash(_docs(spark, sf_dir))


@register(
    "doc_simhash_near_pairs",
    oracle=rf"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
  FROM documents
),
th AS (
  SELECT doc_id, ('0x' || substring(md5(t), 1, 8))::BIGINT AS th FROM tok
),
sums AS (SELECT doc_id, {_SIMHASH_SUMS} FROM th GROUP BY doc_id),
fp AS (SELECT doc_id, ({_SIMHASH_FP})::BIGINT AS simhash FROM sums),
pre AS (SELECT doc_id, simhash, simhash >> {D.SIMHASH_BITS - 8} AS bucket FROM fp),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash))::INT AS hamming
  FROM pre a JOIN pre b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming, rank FROM (
  SELECT *, row_number() OVER (ORDER BY hamming ASC, doc_a ASC, doc_b ASC) AS rank
  FROM pairs
) WHERE rank <= 20
""",
    survey_ref="[EXT] dedup-simhash",
    tags=["dedup", "text"],
)
def doc_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closest SimHash pairs among prefix-bucket candidates (top-20 by
    Hamming distance) — the near-dup join, prefix-bucketed for scale."""
    sim = D.simhash(_docs(spark, sf_dir))
    pairs = D.simhash_near_pairs(sim, max_hamming=D.SIMHASH_BITS, prefix_bits=8)
    from write_optimized_vector_database_spark.operators.topk import ranked_top_n

    return ranked_top_n(
        pairs.withColumn("hamming", F.col("hamming").cast("int")),
        [F.col("hamming").asc(), F.col("doc_a").asc(), F.col("doc_b").asc()],
        20,
    ).withColumn("rank", F.col("rank").cast("long"))


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


@register(
    "emb_near_dup_cosine",
    oracle="""
WITH sub AS (SELECT * FROM embeddings WHERE vec_id < 500),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           / (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
              * sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine
  FROM sub a JOIN sub b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine, rank FROM (
  SELECT *, row_number() OVER (ORDER BY cosine DESC, id_a ASC, id_b ASC) AS rank
  FROM pairs
) WHERE rank <= 20
""",
    survey_ref="[EXT] dedup-embedding",
    tags=["dedup", "vector"],
)
def emb_near_dup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar embedding pairs (all-pairs cosine on a bounded
    500-vector slice — the oracle form; `emb_near_dup_bucketed` below is
    the scale path that only pairs within an IVF bucket)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    pairs = D.embedding_near_dup_pairs(emb, threshold=-2.0)
    from write_optimized_vector_database_spark.operators.topk import ranked_top_n

    return ranked_top_n(
        pairs, [F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc()], 20
    ).withColumn("rank", F.col("rank").cast("long"))


_BUCKET_STRIDE = 31


@register(
    "emb_near_dup_bucketed",
    oracle=f"""
WITH cents AS (
  SELECT (vec_id // {_BUCKET_STRIDE})::INT AS centroid_id, embedding::DOUBLE[] AS centroid
  FROM embeddings WHERE vec_id % {_BUCKET_STRIDE} = 0
),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(e.embedding::DOUBLE[], c.centroid) ASC,
                                       c.centroid_id ASC) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           / (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
              * sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine, rank FROM (
  SELECT *, row_number() OVER (ORDER BY cosine DESC, id_a ASC, id_b ASC) AS rank
  FROM pairs
) WHERE rank <= 20
""",
    survey_ref="[EXT] dedup-embedding (ANN-bucketed)",
    tags=["dedup", "vector", "ivf"],
)
def emb_near_dup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB near-dup path: candidate pairs form ONLY inside an IVF
    centroid bucket — pair count scales with bucket sizes, never n²."""
    from write_optimized_vector_database_spark.operators.ivf import (
        assign_centroids_exact,
        centroids_from_stride,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = centroids_from_stride(emb, _BUCKET_STRIDE)
    assigned = assign_centroids_exact(emb, cents)
    buckets = assigned.select(F.col("vec_id").alias("id"), F.col("centroid_id").alias("bucket"))
    pairs = D.embedding_near_dup_pairs(emb, threshold=-2.0, bucket_by=buckets)
    from write_optimized_vector_database_spark.operators.topk import ranked_top_n

    return ranked_top_n(
        pairs, [F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc()], 20
    ).withColumn("rank", F.col("rank").cast("long"))


@register(
    "doc_cdc_chunk_dedup",
    # Content-defined chunking (rolling-window boundary detection, the
    # rsync/LBFS family): a chunk boundary opens wherever the 16-char
    # window's md5 starts with hex nibble 0 (p = 1/16 → ~16-char mean
    # spacing over the content, independent of byte offsets — insertions
    # shift boundaries only locally, which is what makes CDC dedup
    # robust where fixed-size blocks are not). All arithmetic is
    # integer + md5 strings: exactly hash-checkable.
    oracle="""
WITH pos AS (
  SELECT d.doc_id, i.i AS p
  FROM documents d, unnest(range(1, length(d.text) - 16 + 2)) AS i(i)
),
bnd AS (
  SELECT pos.doc_id, pos.p
  FROM pos JOIN documents d ON d.doc_id = pos.doc_id
  WHERE md5(substring(d.text, pos.p::INT, 16)) LIKE '0%'
),
starts AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, 1 AS s FROM documents
    UNION ALL
    SELECT doc_id, p FROM bnd
  )
),
chunks AS (
  SELECT doc_id, s,
         lead(s) OVER (PARTITION BY doc_id ORDER BY s) AS nxt
  FROM starts
),
hashes AS (
  SELECT c.doc_id,
         md5(substring(d.text, c.s::INT,
             coalesce(c.nxt - c.s, length(d.text) - c.s + 1)::INT)) AS chash
  FROM chunks c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT d.source,
       COUNT(*) AS n_chunks,
       COUNT(DISTINCT h.chash) AS n_distinct_chunks
FROM hashes h JOIN documents d ON d.doc_id = h.doc_id
GROUP BY d.source ORDER BY d.source
""",
    survey_ref="[EXT] content-defined chunking + chunk-level dedup",
    tags=["dedup", "text", "chunking"],
)
def doc_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup accounting: content-defined chunk boundaries
    (rolling 16-char window, boundary where the window hash's first hex
    nibble is 0), chunk identity = hash of the chunk text, aggregated
    per source. Everything runs JVM-side: sequence/explode for
    positions, column-arg substring, md5 -- no Python in the plan."""
    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    # For a doc shorter than 16 chars, length-15 < 1 and F.sequence would
    # generate a DESCENDING range (1, 0, -1, ...) of bogus positions,
    # while the oracle's range(1, length-14) is simply empty — emit an
    # empty array for short docs so both engines agree.
    upper = F.length("text") - F.lit(15)
    pos = docs.select(
        "doc_id", "text",
        F.explode(
            F.when(upper >= 1, F.sequence(F.lit(1), upper)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("p"),
    )
    bnd = pos.filter(
        F.md5(F.substring(F.col("text"), F.col("p"), F.lit(16))).startswith("0")
    ).select("doc_id", F.col("p").alias("s"))
    starts = (
        docs.select("doc_id", F.lit(1).alias("s"))
        .unionByName(bnd)
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("s")
    chunks = starts.withColumn("nxt", F.lead("s").over(w))
    hashes = chunks.join(docs, "doc_id").select(
        "doc_id",
        "source",
        F.md5(
            F.substring(
                F.col("text"),
                F.col("s"),
                F.coalesce(
                    F.col("nxt") - F.col("s"),
                    F.length("text") - F.col("s") + F.lit(1),
                ),
            )
        ).alias("chash"),
    )
    return (
        hashes.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chash").alias("n_distinct_chunks"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster connected components
# ---------------------------------------------------------------------------

# Corpus with two synthesized duplicate generations: every 3rd doc gets a
# copy at +1M, every 6th another at +2M — so components are chains
# {id, id+1M, id+2M} whose closure only CLUSTERING (not pair listing)
# recovers. The shingle/sig/band CTEs mirror _SHINGLE_CTE/_LSH_CTE but
# read from the widened corpus.
_CLUSTER_CORPUS_CTE = rf"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 6 = 0
),
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM corpus
),
sh AS (
  SELECT DISTINCT doc_id, substring(t, i::INT, {_SHINGLE_N}) AS shingle
  FROM norm, range(1, 100001) r(i)
  WHERE i <= greatest(length(t) - {_SHINGLE_N - 1}, 1)
),
shh AS (
  SELECT doc_id, ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS s FROM sh
)
"""


@register(
    "doc_dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_CLUSTER_CORPUS_CTE.strip()},
{_LSH_CTE.strip()},
est AS (
  SELECT c.doc_a, c.doc_b,
         ({" + ".join(f"(sa.h{i} = sb.h{i})::INT" for i in range(_NUM_HASHES))})::DOUBLE
           / {_NUM_HASHES} AS jaccard_est
  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
              JOIN sig sb ON sb.doc_id = c.doc_b
),
prs AS (SELECT doc_a, doc_b FROM est WHERE jaccard_est >= 0.6),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM prs
  UNION
  SELECT doc_b, doc_a FROM prs
),
walk(id, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id
),
comp AS (SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id),
sizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id
)
SELECT c.doc_id, c.cluster_id, s.cluster_size,
       (c.doc_id = c.cluster_id) AS is_canonical
FROM comp c JOIN sizes s USING (cluster_id)
""",
    survey_ref="[EXT] dedup-clusters",
    tags=["dedup", "text", "graph"],
)
def doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: MinHash-LSH candidates above an
    estimated-Jaccard threshold feed connected components (iterative
    min-label propagation), yielding one canonical doc per duplicate
    cluster. The `is_canonical` flag is the dedup keep-policy: keep the
    min-id member of every component."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = (
        docs.unionByName(
            docs.filter(F.col("doc_id") % 3 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
            )
        ).unionByName(
            docs.filter(F.col("doc_id") % 6 == 0).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
            )
        )
    )
    sig = _persisted_signatures(corpus, ("cluster_corpus", sf_dir))
    pairs = D.lsh_candidate_pairs(sig, _NUM_HASHES, _BANDS)
    est = D.minhash_jaccard_estimate(sig, pairs, _NUM_HASHES)
    prs = est.filter(F.col("jaccard_est") >= 0.6)
    comp = D.dedup_clusters(prs, "doc_a", "doc_b").select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


@register(
    "emb_quantized_gram",
    oracle="""
WITH q AS (
  SELECT e.vec_id, t.i,
         -- CAST + 1e6 keep the product in DOUBLE: a 1000000.0 literal
         -- is DECIMAL in DuckDB and drags the multiply off the
         -- float64 path Spark uses (119/32000 floors differ)
         CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * 1e6) AS BIGINT) AS qv
  FROM embeddings e, range(1, 65) t(i)
)
SELECT a.i AS i, b.i AS j,
       CAST(SUM(a.qv * b.qv) AS DOUBLE) / 1e12 AS gram
FROM q a JOIN q b ON b.vec_id = a.vec_id AND b.i >= a.i
GROUP BY a.i, b.i
ORDER BY i, j
""",
    survey_ref="[EXT] Gram/covariance matrix (whitening & PCA input)",
    tags=["embedding", "agg", "linalg"],
)
def emb_quantized_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Gram matrix Σ vᵢvⱼ over the embedding corpus — the
    one-pass statistic PCA/whitening/OPQ-style rotations train from.

    Components are QUANTIZED to 1e-6 (floor, not round — round's tie
    rule differs between engines on exact binary fractions like 2⁻⁶) so
    every product and the whole sum are exact BIGINT arithmetic: the
    matrix is hash-identical cross-engine despite being a float
    reduction at heart. Shape at 100 TB: the pair explode is dim²/2 per
    row but the aggregate is map-side partial into dim²/2 ≈ 2k groups —
    the shuffle carries (i, j, partial) triples, never vectors. The
    driver-side eigensolve over the 64×64 result is O(dim³), constant."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("i"),
        F.floor(F.col("v") * 1_000_000.0).cast("long").alias("qv"),
    )
    a, b = comp.alias("a"), comp.alias("b")
    return (
        a.join(
            b,
            (F.col("b.vec_id") == F.col("a.vec_id")) & (F.col("b.i") >= F.col("a.i")),
        )
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg((F.sum(F.col("a.qv") * F.col("b.qv")).cast("double") / F.lit(1e12)).alias("gram"))
        .orderBy("i", "j")
    )


@register(
    "doc_benchmark_contamination",
    oracle=rf"""
WITH {_SHINGLE_CTE.strip()},
bench AS (SELECT doc_id, s FROM shh WHERE doc_id % 97 = 0),
corpus AS (SELECT doc_id, s FROM shh WHERE doc_id % 97 <> 0),
hits AS (
  SELECT c.doc_id,
         COUNT(DISTINCT c.s) AS n_shared_shingles,
         COUNT(DISTINCT b.doc_id) AS n_bench_docs
  FROM corpus c JOIN bench b ON b.s = c.s
  GROUP BY c.doc_id
)
SELECT doc_id, n_shared_shingles, n_bench_docs, rank FROM (
  SELECT doc_id, n_shared_shingles, n_bench_docs,
         row_number() OVER (ORDER BY n_shared_shingles DESC, doc_id ASC) AS rank
  FROM hits
) WHERE rank <= 50
""",
    survey_ref="[EXT] benchmark decontamination (shingle-overlap join)",
    tags=["text", "dedup", "pipeline"],
)
def doc_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set decontamination: rank corpus documents by how many
    distinct shingles they share with a held-out benchmark set (here the
    doc_id % 97 == 0 slice stands in for the benchmark).

    The shape is ONE equality join on the 32-bit shingle hash — the
    benchmark side is tiny (benchmarks are thousands of docs, the corpus
    is billions), so at scale it broadcasts and contamination checking
    is a map-side probe of the corpus shingle stream, never a pairwise
    document comparison."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_hashes(docs, n=_SHINGLE_N)
    bench = sh.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "sh"
    )
    corpus = sh.filter(F.col("doc_id") % 97 != 0)
    hits = (
        corpus.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("n_shared_shingles"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )
    from write_optimized_vector_database_spark.operators.topk import ranked_top_n

    return ranked_top_n(
        hits,
        [F.col("n_shared_shingles").desc(), F.col("doc_id").asc()],
        50,
    ).withColumn("rank", F.col("rank").cast("long"))


# Same duplicate-chain corpus, but the copies carry an extra tail so
# cluster members DIFFER in length — which makes keep-longest a real
# policy decision instead of collapsing into keep-min-id.
_KEEPBEST_CORPUS_CTE = rf"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' extra tail content appended here'
  FROM documents WHERE doc_id % 3 = 0
),
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM corpus
),
sh AS (
  SELECT DISTINCT doc_id, substring(t, i::INT, {_SHINGLE_N}) AS shingle
  FROM norm, range(1, 100001) r(i)
  WHERE i <= greatest(length(t) - {_SHINGLE_N - 1}, 1)
),
shh AS (
  SELECT doc_id, ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS s FROM sh
)
"""


@register(
    "doc_dedup_keep_longest",
    oracle=f"""
WITH RECURSIVE {_KEEPBEST_CORPUS_CTE.strip()},
{_LSH_CTE.strip()},
est AS (
  SELECT c.doc_a, c.doc_b,
         ({" + ".join(f"(sa.h{i} = sb.h{i})::INT" for i in range(_NUM_HASHES))})::DOUBLE
           / {_NUM_HASHES} AS jaccard_est
  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
              JOIN sig sb ON sb.doc_id = c.doc_b
),
prs AS (SELECT doc_a, doc_b FROM est WHERE jaccard_est >= 0.5),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM prs
  UNION
  SELECT doc_b, doc_a FROM prs
),
walk(id, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id
),
comp AS (SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id),
lens AS (SELECT doc_id, length(t) AS n_chars FROM norm),
ranked AS (
  SELECT c.cluster_id, c.doc_id, l.n_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY l.n_chars DESC, c.doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
  FROM comp c JOIN lens l USING (doc_id)
)
SELECT cluster_id, doc_id AS kept_doc_id, n_chars AS kept_chars, cluster_size
FROM ranked WHERE rn = 1
ORDER BY cluster_id
""",
    survey_ref="[EXT] dedup keep-policy (keep-longest per cluster)",
    tags=["dedup", "text", "graph", "pipeline"],
)
def doc_dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup POLICY stage: per near-dup cluster keep the LONGEST
    member (the CCNet/RefinedWeb-style 'keep the most complete copy'
    rule), not the min-id. The corpus's synthesized copies carry an
    extra tail, so the policy provably diverges from keep-first — the
    kept id is the +1M copy wherever one exists. Composition of the
    existing cluster operator with one length join + one window."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra tail content appended here")).alias(
                "text"
            ),
        )
    )
    sig = _persisted_signatures(corpus, ("tailed_corpus", sf_dir))
    pairs = D.lsh_candidate_pairs(sig, _NUM_HASHES, _BANDS)
    est = D.minhash_jaccard_estimate(sig, pairs, _NUM_HASHES)
    prs = est.filter(F.col("jaccard_est") >= 0.5)
    comp = D.dedup_clusters(prs, "doc_a", "doc_b").select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    lens = corpus.select(
        "doc_id", F.length(TX.normalize_text("text")).alias("n_chars")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = (
        comp.join(lens, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("n_chars").alias("kept_chars"),
            "cluster_size",
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Containment near-supersets (quotation / inclusion detection)
# ---------------------------------------------------------------------------

_CONTAIN_SHINGLE_N = 12  # long shingles = word-trigram-ish rarity
_CONTAIN_DF_CAP = 12  # shingles seen in more docs carry no pair evidence
_CONTAIN_PCT = 80  # containment threshold, integer percent
_CONTAIN_MIN_SET = 20  # pairs need a meaningful rare-shingle denominator


@register(
    "doc_containment_near_supersets",
    # containment = |A∩B| / min(|A|,|B|) over RARE long shingles
    # (char-12-grams ~ word trigrams on normalized text; document
    # frequency <= cap). Catches snippet-inside-article inclusion that
    # Jaccard misses (a 200-char quote of a 4k-char doc has Jaccard
    # ~0.05 but containment ~1.0). The corpus gains a synthesized
    # snippet (the first 240 chars of every 5th doc) so the gate has
    # true positives to find. Threshold compare is integer-exact:
    # shared*100 >= pct*min(n_a,n_b).
    oracle=rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, substring(text, 1, 240) FROM documents
  WHERE doc_id % 5 = 0
),
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM corpus
),
sh AS (
  SELECT DISTINCT doc_id, substring(t, i::INT, {_CONTAIN_SHINGLE_N}) AS shingle
  FROM norm, range(1, 100001) r(i)
  WHERE i <= greatest(length(t) - {_CONTAIN_SHINGLE_N - 1}, 1)
),
shh AS (
  SELECT doc_id, ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS s FROM sh
),
df AS (
  SELECT s FROM shh GROUP BY s
  HAVING COUNT(DISTINCT doc_id) <= {_CONTAIN_DF_CAP}
),
rare AS (SELECT shh.doc_id, shh.s FROM shh JOIN df ON df.s = shh.s),
sizes AS (SELECT doc_id, COUNT(DISTINCT s) AS n FROM rare GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(DISTINCT a.s) AS n_shared
  FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT s.doc_a, s.doc_b, s.n_shared, sa.n AS n_a, sb.n AS n_b,
       CAST(s.n_shared AS DOUBLE) / least(sa.n, sb.n) AS containment
FROM shared s
JOIN sizes sa ON sa.doc_id = s.doc_a
JOIN sizes sb ON sb.doc_id = s.doc_b
WHERE s.n_shared * 100 >= {_CONTAIN_PCT} * least(sa.n, sb.n)
  AND least(sa.n, sb.n) >= {_CONTAIN_MIN_SET}
ORDER BY s.doc_a, s.doc_b
""",
    survey_ref="[EXT] containment near-supersets (asymmetric inclusion dedup)",
    tags=["dedup", "text"],
)
def doc_containment_near_supersets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (overlap-coefficient) near-superset detection: finds
    documents whose rare-shingle set is >=80% contained in another's —
    the quotation / boilerplate-inclusion case where symmetric Jaccard
    stays tiny.

    100 TB shape: candidate generation is the equality join on the
    32-bit shingle hash, with the document-frequency cap (df <= 12) as
    the blow-up control — a shingle shared by d docs contributes
    O(d^2) candidate pairs, so stop-shingles (boilerplate seen
    everywhere) are dropped BEFORE the join, exactly the df-capped
    posting-list pruning web-dedup systems use. Everything downstream
    runs on the surviving pair shortlist."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    snippets = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.substring("text", 1, 240).alias("text"),
    )
    corpus = docs.unionByName(snippets)
    # ONE groupBy(sh) builds df-capped posting lists and every
    # downstream count is a plain count — no countDistinct, no
    # posting-table self-join. Pairs explode inline from the sorted
    # ≤cap-sized list (bounded cap·(cap-1)/2 per shingle). collect_SET,
    # not list (ADVICE r03): (doc_id, shingle) is distinct per doc, but
    # two distinct shingles in one doc can collide to the same 32-bit
    # sh — a duplicated doc_id would inflate sizes and emit
    # doc_a == doc_b pairs, while the oracle's COUNT(DISTINCT) dedups.
    shh = D.shingle_hashes(corpus, n=_CONTAIN_SHINGLE_N)
    posting = (
        shh.groupBy("sh")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .filter(F.size("ds") <= _CONTAIN_DF_CAP)
    )
    # posting feeds both branches below; the shared groupBy(sh) exchange
    # is deduplicated by ReusedExchange in the final plan, so no persist.
    sizes = (
        posting.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pair_expr = (
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), "
        "y -> struct(x AS doc_a, y AS doc_b))))"
    )
    shared = (
        posting.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            (F.col("n_shared") * 100 >= _CONTAIN_PCT * F.least("n_a", "n_b"))
            & (F.least("n_a", "n_b") >= _CONTAIN_MIN_SET)
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_a",
            "n_b",
            (F.col("n_shared").cast("double") / F.least("n_a", "n_b")).alias(
                "containment"
            ),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new batch vs existing corpus (the ingest-time shape)
# ---------------------------------------------------------------------------


@register(
    "doc_incremental_dedup_delta",
    # classify each NEW document against the already-ingested corpus:
    # dup_of_corpus (fingerprint already stored), dup_in_batch (another
    # batch doc with the same fingerprint and a smaller id wins), or
    # novel. corpus = doc_id % 10 != 0; batch = doc_id % 10 == 0 plus
    # re-submissions of every 7th corpus doc (id + 3000000) so both dup
    # classes have true positives.
    oracle=r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0
),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 3000000, text FROM documents
  WHERE doc_id % 10 != 0 AND doc_id % 7 = 0
),
cfp AS (
  SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
  FROM corpus
),
bfp AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
         row_number() OVER (
           PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
           ORDER BY doc_id) AS rn
  FROM batch
)
SELECT b.doc_id,
       CASE WHEN c.fp IS NOT NULL THEN 'dup_of_corpus'
            WHEN b.rn > 1 THEN 'dup_in_batch'
            ELSE 'novel' END AS status,
       b.fp
FROM bfp b LEFT JOIN cfp c ON c.fp = b.fp
ORDER BY b.doc_id
""",
    survey_ref="[EXT] incremental ingest dedup (batch vs corpus, ingest-time filter)",
    tags=["dedup", "text", "pipeline"],
)
def doc_incremental_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time incremental dedup: classify a new batch against the
    existing corpus WITHOUT reshuffling the corpus. The corpus side is
    reduced to the set of its fingerprints hit by the batch (semi-join
    with the batch fingerprints broadcast), which is then itself tiny
    and broadcast back onto the batch — two broadcast joins, the 100 TB
    corpus is scanned once map-side and never exchanged. Batch-internal
    dups resolve by a window over the (small) batch only."""
    from pyspark.sql import Window

    from write_optimized_vector_database_spark.operators.dedup import fingerprint

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0).unionByName(
        docs.filter((F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 7 == 0)).select(
            (F.col("doc_id") + 3000000).alias("doc_id"), "text"
        )
    )
    bfp = batch.select("doc_id", fingerprint("text").alias("fp"))
    hit_fps = (
        corpus.select(fingerprint("text").alias("fp"))
        .join(F.broadcast(bfp.select("fp").distinct()), "fp", "semi")
        .distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        bfp.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(hit_fps), "fp", "left")
        .select(
            "doc_id",
            F.when(F.col("in_corpus"), F.lit("dup_of_corpus"))
            .when(F.col("rn") > 1, F.lit("dup_in_batch"))
            .otherwise(F.lit("novel"))
            .alias("status"),
            "fp",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# LSH quality evaluation: candidate precision/recall vs planted pairs
# ---------------------------------------------------------------------------


@register(
    "doc_lsh_eval_pr",
    # evaluation-as-data: plant a near-duplicate for every 4th doc
    # (same text + a short tail -> high but non-1.0 Jaccard), run the
    # standard MinHash-LSH candidate generation, and report integer
    # precision/recall of the candidate set against the planted truth.
    oracle=rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 6000000, text || ' tail variant ' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 4 = 0
),
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM corpus
),
sh AS (
  SELECT DISTINCT doc_id, substring(t, i::INT, {_SHINGLE_N}) AS shingle
  FROM norm, range(1, 100001) r(i)
  WHERE i <= greatest(length(t) - {_SHINGLE_N - 1}, 1)
),
shh AS (
  SELECT doc_id, ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS s FROM sh
),
sig AS (SELECT doc_id, {_SIG_SELECT} FROM shh GROUP BY doc_id),
bands AS (
  SELECT doc_id, b.b::INT AS band, CASE b.b {_BAND_CASE} END AS key
  FROM sig, range({_BANDS}) b(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
),
truth AS (
  SELECT doc_id AS doc_a, doc_id + 6000000 AS doc_b
  FROM documents WHERE doc_id % 4 = 0
),
hits AS (
  SELECT c.doc_a, c.doc_b FROM cand c JOIN truth t
    ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
)
SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
       (SELECT COUNT(*) FROM cand) AS n_candidates,
       (SELECT COUNT(*) FROM hits) AS n_hits,
       (SELECT COUNT(*) FROM hits) * 100 // (SELECT COUNT(*) FROM cand)
         AS precision_x100,
       (SELECT COUNT(*) FROM hits) * 100 // (SELECT COUNT(*) FROM truth)
         AS recall_x100
""",
    survey_ref="[EXT] LSH candidate-quality evaluation (precision/recall vs planted pairs)",
    tags=["dedup", "text", "lsh", "analytics"],
)
def doc_lsh_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-set quality of the MinHash-LSH pipeline, measured as
    data: every 4th document gets a planted near-duplicate (same text
    plus a short tail), the SHIPPED signature/banding code generates
    candidates, and integer precision/recall against the planted pairs
    come out as one row. The banding tradeoff (2 bands x 8 rows:
    selective, recall < 100% by design at this Jaccard) becomes a
    number the operator's consumers can regression-watch.

    100 TB shape: identical to the production LSH path (band-bucket
    join only); truth and hit joins run on the planted-pair list, which
    is corpus/4 rows."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 6000000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" tail variant "), F.col("doc_id").cast("string")
        ).alias("text"),
    )
    corpus = docs.unionByName(planted)
    sig = D.minhash_signatures(corpus, _NUM_HASHES, _SHINGLE_N)
    cand = D.lsh_candidate_pairs(sig, _NUM_HASHES, _BANDS).select("doc_a", "doc_b")
    truth = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 6000000).alias("doc_b"),
    )
    hits = cand.join(truth, ["doc_a", "doc_b"], "semi")
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_hits = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        n_truth.crossJoin(n_cand)
        .crossJoin(n_hits)
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            F.floor(F.col("n_hits") * 100 / F.col("n_candidates"))
            .cast("long")
            .alias("precision_x100"),
            F.floor(F.col("n_hits") * 100 / F.col("n_truth"))
            .cast("long")
            .alias("recall_x100"),
        )
    )


@register(
    "emb_exact_vector_dedup",
    # exact embedding dedup: byte-identical vectors (after micro-unit
    # quantization) collapse to one representative — the cheap pass
    # that runs BEFORE cosine near-dup, catching re-embedded copies.
    # Corpus plants exact duplicates (every 6th vector re-registered).
    oracle="""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 7000000, embedding FROM embeddings WHERE vec_id % 6 = 0
),
keyed AS (
  SELECT vec_id,
         md5(CAST(list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
             AS VARCHAR)) AS vfp
  FROM corpus
)
SELECT vfp, MIN(vec_id) AS representative, COUNT(*) AS group_size
FROM keyed GROUP BY vfp
HAVING COUNT(*) > 1
ORDER BY representative
""",
    survey_ref="[EXT] exact embedding dedup (quantized byte-identity groups)",
    tags=["dedup", "vector"],
)
def emb_exact_vector_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (quantized byte-identity) embedding dedup: vectors hashing
    to the same micro-unit fingerprint collapse to the min-id
    representative — the cheap first pass of embedding-space dedup,
    before the bucketed cosine near-dup handles the near-misses.

    100 TB shape: one md5 per vector at scan time, one group-by on the
    32-hex key — the same single-shuffle shape as text exact-dedup."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dupes = emb.filter(F.col("vec_id") % 6 == 0).select(
        (F.col("vec_id") + 7000000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(dupes)
    vfp = F.md5(
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000000.0 + 0.5).cast("long"),
        ).cast("string")
    )
    return (
        corpus.select("vec_id", vfp.alias("vfp"))
        .groupBy("vfp")
        .agg(
            F.min("vec_id").alias("representative"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
        .orderBy("representative")
    )


@register(
    "doc_shingle_df_histogram",
    # diagnostics-as-data for the dedup family: the document-frequency
    # distribution of long shingles, log-bucketed — the histogram that
    # justifies (and tunes) the df cap protecting candidate generation.
    # NOTE (ADVICE r03): the df CTE groups by the 32-bit portable HASH of
    # the shingle, not the shingle string — Spark's pipeline joins on the
    # hash, so the oracle must merge colliding shingles the same way or
    # the gate breaks the moment the vocabulary hits a birthday collision.
    oracle=rf"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         ('0x' || substring(md5(substring(t, i::INT, {_CONTAIN_SHINGLE_N})), 1, 8))::BIGINT AS sh
  FROM norm, range(1, 100001) r(i)
  WHERE i <= greatest(length(t) - {_CONTAIN_SHINGLE_N - 1}, 1)
),
df AS (SELECT sh, COUNT(DISTINCT doc_id) AS c FROM sh GROUP BY sh)
SELECT CASE WHEN c = 1 THEN 0 WHEN c = 2 THEN 1 WHEN c <= 4 THEN 2
            WHEN c <= 8 THEN 3 WHEN c <= 16 THEN 4 WHEN c <= 64 THEN 5
            ELSE 6 END AS df_bucket,
       COUNT(*) AS n_shingles,
       SUM(c)::BIGINT AS n_postings,
       SUM(c * (c - 1) // 2)::BIGINT AS pair_mass
FROM df GROUP BY df_bucket ORDER BY df_bucket
""",
    survey_ref="[EXT] shingle df histogram (df-cap tuning for candidate generation)",
    tags=["dedup", "text", "analytics"],
)
def doc_shingle_df_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency histogram of the long shingles the
    containment pipeline joins on, with each bucket's PAIR MASS
    (sum of c*(c-1)/2) — the number that shows exactly how much
    candidate-join work each df stratum would generate, i.e. the
    evidence behind the df <= cap pruning rule.

    100 TB shape: one shingle group-by (the pipeline pays it anyway)
    then a 7-row aggregate; pair mass is integer arithmetic on the
    counts, no pair ever materializes."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    shh = D.shingle_hashes(docs, n=_CONTAIN_SHINGLE_N)
    df = shh.groupBy("sh").agg(F.countDistinct("doc_id").alias("c"))
    bucket = (
        F.when(F.col("c") == 1, 0)
        .when(F.col("c") == 2, 1)
        .when(F.col("c") <= 4, 2)
        .when(F.col("c") <= 8, 3)
        .when(F.col("c") <= 16, 4)
        .when(F.col("c") <= 64, 5)
        .otherwise(6)
    )
    return (
        df.select(bucket.alias("df_bucket"), "c")
        .groupBy("df_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("c").alias("n_postings"),
            F.sum(F.floor(F.col("c") * (F.col("c") - 1) / 2).cast("long")).alias(
                "pair_mass"
            ),
        )
        .orderBy("df_bucket")
    )


@register(
    "doc_lsh_bucket_stats",
    # The LSH skew pre-flight (VERDICT r04 #7 / docs/SCALE.md): the
    # candidate join's cost is Σ|bucket|², so a production dedup run
    # checks this 1-row report BEFORE committing to the pair join. The
    # oracle replays the identical signature→band pipeline in SQL; all
    # three stats are exact integers, so the hash pins the banding keys
    # bit-for-bit.
    oracle=f"""
WITH {_SHINGLE_CTE.strip().rstrip(')') + ')'},
sig AS (SELECT doc_id, {_SIG_SELECT} FROM shh GROUP BY doc_id),
bands AS (
  SELECT doc_id, b.b::INT AS band, CASE b.b {_BAND_CASE} END AS key
  FROM sig, range({_BANDS}) b(b)
),
sizes AS (SELECT band, key, COUNT(*) AS c FROM bands GROUP BY band, key)
SELECT COUNT(*) AS n_buckets,
       MAX(c) AS max_bucket,
       SUM(c * c)::BIGINT AS sum_sq_buckets
FROM sizes
""",
    survey_ref="[EXT] dedup-lsh skew telemetry (bucket-size distribution)",
    tags=["dedup", "text", "stats"],
)
def doc_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-bucket size distribution of the MinHash-LSH index — max and
    Σ² are the two numbers that decide whether the candidate join is
    safe to run (one degenerate bucket dominates quadratically). One
    groupBy over the banded keys + a 1-row agg; at 100 TB this costs a
    single shuffle of (band, key) pairs with map-side partials."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    sig = _persisted_signatures(docs, ("docs", sf_dir))
    return D.lsh_bucket_stats(sig, _NUM_HASHES, _BANDS).select(
        F.col("n_buckets"),
        F.col("max_bucket"),
        F.col("sum_sq_buckets"),
    )


_SEMDEDUP_TAU = 0.999
_SEMDEDUP_STRIDE = 31


@register(
    "emb_semantic_dedup_keep_best",
    # SemDeDup (Abbas et al. 2023, public): cluster in embedding space,
    # call members above a cosine threshold semantic duplicates, keep ONE
    # per group — the member LEAST similar to its cluster centroid, which
    # preserves the most diversity. Corpus = embeddings ∪ planted copies
    # (every 5th vector scaled ×1.001 — cosine-1 twins; probed: the
    # fixture has no natural ≥0.999 pair, so the output is exactly the
    # planted structure and the whole pipeline stays hash-checkable).
    oracle=f"""
WITH RECURSIVE corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, list_transform(embedding::DOUBLE[], x -> x * 1.001)
  FROM embeddings WHERE vec_id % 5 = 0
),
cents AS (
  SELECT (vec_id // {_SEMDEDUP_STRIDE})::INT AS centroid_id, embedding::DOUBLE[] AS centroid
  FROM embeddings WHERE vec_id % {_SEMDEDUP_STRIDE} = 0
),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(e.embedding, c.centroid) ASC,
                                       c.centroid_id ASC) AS rn
    FROM corpus e CROSS JOIN cents c
  ) WHERE rn = 1
),
prs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE list_inner_product(a.embedding, b.embedding)
        / (sqrt(list_inner_product(a.embedding, a.embedding))
           * sqrt(list_inner_product(b.embedding, b.embedding))) >= {_SEMDEDUP_TAU}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM prs
  UNION
  SELECT id_b, id_a FROM prs
),
walk(id, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id
),
comp AS (SELECT id, min(label) AS cluster_id FROM walk GROUP BY id),
scored AS (
  SELECT c.cluster_id, a.vec_id,
         list_inner_product(a.embedding, ct.centroid)
           / (sqrt(list_inner_product(a.embedding, a.embedding))
              * sqrt(list_inner_product(ct.centroid, ct.centroid))) AS cos_c
  FROM comp c JOIN assigned a ON a.vec_id = c.id
              JOIN cents ct ON ct.centroid_id = a.centroid_id
),
sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM scored GROUP BY cluster_id)
SELECT s.cluster_id, z.cluster_size, s.vec_id AS keep_id,
       s.cos_c AS keep_centroid_cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
                               ORDER BY cos_c ASC, vec_id ASC) AS rn
  FROM scored
) s JOIN sizes z USING (cluster_id)
WHERE s.rn = 1
""",
    survey_ref="[EXT] SemDeDup semantic dedup (keep least-central member)",
    tags=["dedup", "vector", "ivf", "graph"],
)
def emb_semantic_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: bucket the corpus by IVF cell,
    pair ONLY within a cell (never n²), call cosine ≥ τ semantic
    duplicates, close them into components, and keep the member LEAST
    similar to its cell centroid (max-diversity keep rule) — dropping
    cluster_size − 1 vectors per group.

    100 TB shape: the pair join is the bucketed `emb_near_dup_bucketed`
    plan (pair mass ∝ Σ bucket², telemetry'd by `doc_lsh_bucket_stats`'s
    embedding analog `emb_ivf_balance_stats`); components are min-label
    propagation over the EDGE set only (O(rounds × |pairs|)); the keep
    rule is one window over cluster members. Nothing driver-side except
    the ≤nlist centroid rows."""
    from write_optimized_vector_database_spark.functions.distance import (
        dot_product,
        l2_norm,
    )
    from write_optimized_vector_database_spark.operators.ivf import (
        assign_centroids_exact,
        centroids_from_stride,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    embd = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    copies = embd.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    corpus = embd.unionByName(copies)
    cents = centroids_from_stride(emb, _SEMDEDUP_STRIDE)
    assigned = assign_centroids_exact(corpus, cents)
    buckets = assigned.select(
        F.col("vec_id").alias("id"), F.col("centroid_id").alias("bucket")
    )
    pairs = D.embedding_near_dup_pairs(
        corpus, threshold=_SEMDEDUP_TAU, bucket_by=buckets
    )
    comp = D.dedup_clusters(pairs, "id_a", "id_b")  # (id, cluster_id)
    scored = (
        comp.join(assigned, comp["id"] == assigned["vec_id"])
        .join(cents, "centroid_id")
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
    sizes = scored.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
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
