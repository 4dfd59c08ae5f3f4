"""Text-analysis query registrations `[EXT]`: language-ID, quality
scoring, token counting, fingerprinting (SURVEY §2 [EXT] text analysis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators import textops as TX
from write_optimized_vector_database_spark.queries import register
from write_optimized_vector_database_spark.sources.tables import load_table

_TOKENS_SQL = r"string_split_regex(trim(lower(text)), '\s+')"


def _hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TX.LANG_STOPWORDS[lang])
    return (
        f"len(list_filter({_TOKENS_SQL}, t -> list_contains([{words}], t)))"
    )


_LANGS = sorted(TX.LANG_STOPWORDS)  # de, en, es, fr, zh
_HITS_COLS = ", ".join(f"{_hits_sql(lang)} AS hit_{lang}" for lang in _LANGS)


def _guess_case() -> str:
    """First language (alphabetical) achieving the max hit count; 'und'
    when nothing matches — mirrors textops.lang_guess exactly."""
    clauses = []
    for i, lang in enumerate(_LANGS):
        others = [f"hit_{lang} >= hit_{o}" for o in _LANGS[i + 1 :]]
        cond = " AND ".join(others) if others else "TRUE"
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    greatest = ", ".join(f"hit_{la}" for la in _LANGS)
    return (
        f"CASE WHEN greatest({greatest}) = 0 THEN 'und' "
        + " ".join(clauses[:-1])
        + f" ELSE '{_LANGS[-1]}' END"
    )


@register(
    "doc_lang_id",
    oracle=f"""
WITH hits AS (
  SELECT doc_id, lang, {_HITS_COLS} FROM documents
)
SELECT doc_id, lang, {_guess_case()} AS lang_guess FROM hits
""",
    survey_ref="[EXT] text-lang-id",
    tags=["text"],
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (n-gram heuristic): per-doc guess next
    to the fixture's labeled lang."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", TX.lang_guess("text").alias("lang_guess"))


@register(
    "doc_quality_scores",
    oracle=r"""
WITH feats AS (
  SELECT doc_id,
    length(text)::BIGINT AS n_chars,
    len(string_split_regex(trim(lower(text)), '\s+'))::BIGINT AS n_tokens,
    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS n_tokens_bpe,
    length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g'))
      / greatest(length(text), 1) AS punct_ratio,
    length(regexp_replace(text, '[^0-9]', '', 'g')) / greatest(length(text), 1) AS digit_ratio,
    length(regexp_replace(text, '[^ ]', '', 'g')) / greatest(length(text), 1) AS space_ratio,
    list_sum(list_transform(string_split_regex(trim(lower(text)), '\s+'),
                            t -> length(t)))::DOUBLE
      / greatest(len(string_split_regex(trim(lower(text)), '\s+')), 1) AS mean_token_len,
    length(regexp_replace(text, '[^A-Z]', '', 'g')) / greatest(length(text), 1) AS upper_ratio
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_tokens_bpe, punct_ratio, digit_ratio,
       space_ratio, mean_token_len, upper_ratio,
       1.0 - least(1.0, punct_ratio * 4) * 0.25
           - least(1.0, digit_ratio * 4) * 0.25
           - (CASE WHEN n_tokens < 5 OR n_tokens > 10000 THEN 0.25 ELSE 0.0 END)
           - (CASE WHEN mean_token_len < 2 OR mean_token_len > 12 THEN 0.25 ELSE 0.0 END)
         AS quality
FROM feats
""",
    survey_ref="[EXT] text-quality",
    tags=["text"],
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality features + composite score per document."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return TX.quality_score(docs).drop("text")


@register(
    "doc_token_stats_by_source",
    oracle=r"""
SELECT source,
       count(*) AS n_docs,
       sum(len(string_split_regex(trim(lower(text)), '\s+')))::BIGINT AS total_tokens,
       sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))::BIGINT AS total_tokens_bpe,
       sum(length(text))::BIGINT AS total_chars,
       min(length(text))::BIGINT AS min_chars,
       max(length(text))::BIGINT AS max_chars
FROM documents GROUP BY source ORDER BY source
""",
    survey_ref="[EXT] text-token-count",
    tags=["text", "agg"],
)
def doc_token_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per source — integer-exact aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(TX.token_count_ws("text")).cast("long").alias("total_tokens"),
            F.sum(TX.token_count_bpe_ish("text")).cast("long").alias("total_tokens_bpe"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
            F.min(F.length("text")).cast("long").alias("min_chars"),
            F.max(F.length("text")).cast("long").alias("max_chars"),
        )
        .orderBy("source")
    )


@register(
    "doc_fingerprints",
    oracle=r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
FROM documents WHERE doc_id < 100
""",
    survey_ref="[EXT] text-fingerprint",
    tags=["text"],
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints (md5 over normalized text)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select("doc_id", TX.fingerprint("text").alias("fp"))


@register(
    "doc_training_set_selection",
    oracle=r"""
WITH corpus AS (
  SELECT doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, lang, source FROM documents WHERE doc_id % 3 = 0
),
feats AS (
  SELECT doc_id, text, lang, source,
    len(string_split_regex(trim(lower(text)), '\s+'))::BIGINT AS n_tokens,
    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS n_tokens_bpe,
    length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g'))
      / greatest(length(text), 1) AS punct_ratio,
    length(regexp_replace(text, '[^0-9]', '', 'g')) / greatest(length(text), 1) AS digit_ratio,
    list_sum(list_transform(string_split_regex(trim(lower(text)), '\s+'),
                            t -> length(t)))::DOUBLE
      / greatest(len(string_split_regex(trim(lower(text)), '\s+')), 1) AS mean_token_len
  FROM corpus
),
scored AS (
  SELECT *,
    1.0 - least(1.0, punct_ratio * 4) * 0.25
        - least(1.0, digit_ratio * 4) * 0.25
        - (CASE WHEN n_tokens < 5 OR n_tokens > 10000 THEN 0.25 ELSE 0.0 END)
        - (CASE WHEN mean_token_len < 2 OR mean_token_len > 12 THEN 0.25 ELSE 0.0 END)
      AS quality
  FROM feats
),
gated AS (
  SELECT * FROM scored
  WHERE lang = 'en' AND quality >= 0.75 AND n_tokens >= 40
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
      ORDER BY doc_id ASC) AS rn
    FROM gated
  ) WHERE rn = 1
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens_bpe) AS BIGINT) AS total_tokens_bpe,  -- SUM(BIGINT)→HUGEINT→float64 via pandas otherwise
       CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) AS sum_quality
FROM deduped
GROUP BY source ORDER BY source
""",
    survey_ref="[EXT] training-data selection pipeline (lang + quality + dedup)",
    tags=["text", "dedup", "pipeline"],
)
def doc_training_set_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-set selection over a corpus with synthesized
    duplicates: language gate -> quality-score gate -> token floor ->
    exact-dedup keep-first -> per-source token accounting. Every stage is
    one of the engine's own operators (textops.quality_score,
    dedup.dedup_keep_first) composed in a single Catalyst plan -- the
    shape of a real corpus-curation job, with filters running BEFORE the
    dedup shuffle so the shuffle carries only surviving docs."""
    from write_optimized_vector_database_spark.operators.dedup import dedup_keep_first

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    dupes = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang", "source"
    )
    corpus = docs.unionByName(dupes)
    scored = TX.quality_score(corpus)
    gated = scored.filter(
        (F.col("lang") == "en") & (F.col("quality") >= 0.75) & (F.col("n_tokens") >= 40)
    )
    kept = dedup_keep_first(gated)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens_bpe").alias("total_tokens_bpe"),
            F.sum(F.col("quality").cast("decimal(18,6)")).cast("double").alias("sum_quality"),
        )
        .orderBy("source")
    )


_CMS_D, _CMS_W = 4, 256

# ONE md5 per term occurrence; the d row-buckets derive from it with
# the same affine-mod-P family MinHash uses (products < 2^48 — exact
# BIGINT in both engines). d× fewer md5 evaluations than hashing
# (term, row) pairs — the dominant cost of sketch maintenance.
_CMS_P = 2_147_483_647
_CMS_HASH = (
    "((h * (2 * r.r + 3) + (7 * r.r + 1)) % " + str(_CMS_P) + ") % " + str(_CMS_W)
)

_CMS_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
hashed AS (
  SELECT term, ('0x' || substring(md5(term), 1, 8))::BIGINT AS h FROM toks
),
counters AS (
  SELECT r.r AS row, {_CMS_HASH} AS bucket,
         count(*)::BIGINT AS c
  FROM hashed, range({_CMS_D}) r(r)
  GROUP BY 1, 2
),
terms AS (SELECT DISTINCT term, h FROM hashed),
probes AS (
  SELECT t.term, r.r AS row, {_CMS_HASH.replace("h *", "t.h *")} AS bucket
  FROM terms t, range({_CMS_D}) r(r)
),
est AS (
  SELECT p.term, min(c.c) AS cms_count
  FROM probes p JOIN counters c ON c.row = p.row AND c.bucket = p.bucket
  GROUP BY p.term
),
exact AS (SELECT term, count(*)::BIGINT AS exact_count FROM toks GROUP BY term)
SELECT term, cms_count, exact_count, rank FROM (
  SELECT e.term, e.cms_count, x.exact_count,
         row_number() OVER (ORDER BY e.cms_count DESC, e.term ASC) AS rank
  FROM est e JOIN exact x ON x.term = e.term
) WHERE rank <= 20
"""


@register(
    "doc_cms_heavy_hitters",
    oracle=_CMS_ORACLE,
    survey_ref="[EXT] count-min sketch heavy hitters (integer-exact twin)",
    tags=["text", "sketch", "agg"],
)
def doc_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch (d=4 rows x w=256 buckets,
    Cormode-Muthukrishnan): counters are one groupBy over (row, bucket),
    estimates are the min over each term's d probes -- overestimates
    only, never under (the CMS guarantee; visible here next to the exact
    count). All integer arithmetic on md5-portable buckets, so the
    sketch itself is hash-checked cross-engine. At scale the counter
    table is d x w cells regardless of corpus size -- the point of
    sketching."""
    from write_optimized_vector_database_spark.functions.hashing import portable_hash

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
    )
    rows = spark.range(_CMS_D).select(F.col("id").cast("int").alias("row"))

    def bucket():
        # h already 32-bit; A ≤ 2·d+3, so h·A < 2^48 — exact in a long
        return (
            (F.col("h") * (2 * F.col("row") + 3) + (7 * F.col("row") + 1))
            % _CMS_P
            % _CMS_W
        ).alias("bucket")

    hashed = toks.select("term", portable_hash("term").alias("h"))
    probed = hashed.crossJoin(F.broadcast(rows)).select("term", "row", bucket())
    counters = probed.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c"))
    term_probes = (
        hashed.distinct()
        .crossJoin(F.broadcast(rows))
        .select("term", "row", bucket())
    )
    est = (
        term_probes.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy("term")
        .agg(F.min("c").alias("cms_count"))
    )
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_count"))
    from write_optimized_vector_database_spark.operators.topk import ranked_top_n

    return ranked_top_n(
        est.join(exact, "term"),
        [F.col("cms_count").desc(), F.col("term").asc()],
        20,
    ).withColumn("rank", F.col("rank").cast("long"))


@register(
    "doc_stratified_split",
    oracle="""
WITH keyed AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8))::BIGINT
           % 10000 AS h
  FROM documents
),
assigned AS (
  SELECT lang,
         CASE WHEN h < 9000 THEN 'train'
              WHEN h < 9500 THEN 'val'
              ELSE 'test' END AS split
  FROM keyed
)
SELECT lang, split, COUNT(*) AS n_docs
FROM assigned GROUP BY lang, split ORDER BY lang, split
""",
    survey_ref="[EXT] training-pipeline stratified split",
    tags=["text", "sampling", "pipeline"],
)
def doc_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by content-stable
    hash, reported per language stratum.

    The split is a pure function of doc_id — reproducible across
    engines, retries, partitions, and table growth (a new crawl batch
    never reshuffles old rows between splits, unlike rand()-based
    splitting). One narrow projection + one partial-aggregated shuffle;
    the same predicate applied at read time IS the split filter, so no
    materialized split column is needed at 100 TB."""
    from write_optimized_vector_database_spark.functions.hashing import portable_hash

    docs = load_table(spark, sf_dir, "documents")
    h = portable_hash(F.concat(F.col("doc_id").cast("string"), F.lit("split"))) % 10000
    split = (
        F.when(h < 9000, F.lit("train"))
        .when(h < 9500, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "split")
    )


# HLL-family distinct sketch: p=8 → 256 registers; rho from the md5
# portable hash's trailing-zero run (statistically equivalent to the
# leading-zero formulation for iid hash bits, and exact integer math in
# both engines). The alpha·m² constant is computed ONCE in Python and
# injected into both twins so the float formula is bit-identical.
_HLL_M = 256
_HLL_ALPHA_M2 = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
# numerator pre-scaled by 2^25 to pair with the integer register sum
# (2^-m scaled to the exact BIGINT 2^(25-m); one float division total)
_HLL_ALPHA_SCALED = _HLL_ALPHA_M2 * float(1 << 25)

_HLL_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
hashed AS (
  SELECT ('0x' || substring(md5(CAST(term AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM toks
),
rhos AS (
  SELECT h % {_HLL_M} AS bucket,
         CASE WHEN (h >> 8) = 0 THEN 25
              ELSE bit_count(((h >> 8) & (-(h >> 8))) - 1) + 1 END AS rho
  FROM hashed
),
regs AS (SELECT bucket, MAX(rho) AS m FROM rhos GROUP BY bucket),
acc AS (
  SELECT COUNT(*) AS n_present,
         SUM(1::BIGINT << (25 - m)) AS s_scaled
  FROM regs
),
ex AS (SELECT COUNT(DISTINCT term) AS n_exact FROM toks)
SELECT ex.n_exact,
       acc.n_present,
       CAST({_HLL_ALPHA_SCALED!r}
            / CAST(acc.s_scaled + ({_HLL_M} - acc.n_present) * 33554432 AS DOUBLE)
         AS DOUBLE) AS hll_estimate
FROM acc, ex
"""


@register(
    "doc_hll_distinct",
    oracle=_HLL_ORACLE,
    survey_ref="[EXT] HLL distinct-count sketch (integer-exact registers)",
    tags=["text", "sketch", "agg"],
)
def doc_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-token estimate via a 256-register HLL-family sketch,
    reported next to the exact COUNT(DISTINCT).

    The register table is 256 rows REGARDLESS of corpus size — the
    whole point at 100 TB: one narrow shuffle on an 8-bit key with
    map-side partial MAX, vs the full-width shuffle of an exact
    distinct. Register updates are integer-only (portable md5 hash +
    trailing-zero run via bit_count), so even the ESTIMATE is
    bit-identical cross-engine; only the final constant/sum division is
    float, and its operands are exact decimals."""
    from write_optimized_vector_database_spark.functions.hashing import portable_hash

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
    )
    hashed = toks.select(portable_hash("term").alias("h"))
    rest = F.shiftright("h", 8)
    rho = F.when(rest == 0, F.lit(25)).otherwise(
        F.bit_count(rest.bitwiseAND(-rest) - 1) + 1
    )
    regs = (
        hashed.select((F.col("h") % _HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m"))
    )
    acc = regs.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 25 - m)")).alias("s_scaled"),
    )
    ex = toks.agg(F.countDistinct("term").alias("n_exact"))
    return ex.crossJoin(acc).select(
        "n_exact",
        "n_present",
        (
            F.lit(_HLL_ALPHA_SCALED)
            / (
                F.col("s_scaled") + (F.lit(_HLL_M) - F.col("n_present")) * (1 << 25)
            ).cast("double")
        ).alias("hll_estimate"),
    )


@register(
    "doc_repetition_stats",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
tris AS (
  SELECT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS trigram
  FROM toks, range(1, 100001) r(i)
  WHERE i <= len(t) - 2
),
per AS (
  SELECT doc_id, COUNT(*) AS n_trigrams,
         COUNT(DISTINCT trigram) AS n_distinct
  FROM tris GROUP BY doc_id
)
SELECT doc_id, n_trigrams, n_distinct,
       CAST(n_trigrams - n_distinct AS DOUBLE) / CAST(n_trigrams AS DOUBLE)
         AS dup_trigram_frac
FROM per ORDER BY doc_id
""",
    survey_ref="[EXT] repetition/quality scoring (Gopher-style dup n-grams)",
    tags=["text", "quality", "pipeline"],
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram repetition — the Gopher-family quality rule
    'fraction of duplicate n-grams' used to drop boilerplate/spam before
    training. Trigrams are built with JVM array ops (sequence +
    transform over the token array — no explode of the corpus until the
    count, no Python). The ratio divides two exact counts in DOUBLE, so
    the score is bit-identical cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    # guard: Spark's sequence(1, 0) DESCENDS ([1,0]) — a <3-token doc
    # must yield an empty trigram array, not two bogus entries
    tris = F.when(F.size(toks) >= 3, F.transform(
        F.sequence(F.lit(1), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )).otherwise(F.array().cast("array<string>"))
    # the statistic is PER DOCUMENT — keep it row-local: size +
    # array_distinct inside codegen, ZERO shuffle (an explode +
    # groupBy-countDistinct shuffles every trigram of the corpus twice
    # to compute a per-row number; measured 8.7s → sub-second at sf0.1)
    per = docs.select(
        "doc_id",
        F.size(tris).cast("long").alias("n_trigrams"),
        F.size(F.array_distinct(tris)).cast("long").alias("n_distinct"),
    )
    return per.select(
        "doc_id",
        "n_trigrams",
        "n_distinct",
        (
            (F.col("n_trigrams") - F.col("n_distinct")).cast("double")
            / F.col("n_trigrams").cast("double")
        ).alias("dup_trigram_frac"),
    ).orderBy("doc_id")


@register(
    "doc_length_weighted_sample",
    oracle="""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'lenw'), 1, 8))::BIGINT
           % 10000 AS h
  FROM documents
),
kept AS (
  SELECT doc_id, lang, n_chars FROM keyed
  WHERE h < least(n_chars * 10, 10000)
)
SELECT lang, COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars,  -- SUM(BIGINT)→HUGEINT→float64 via pandas otherwise
       MIN(doc_id) AS min_doc_id
FROM kept GROUP BY lang ORDER BY lang
""",
    survey_ref="[EXT] length-weighted sampling (training-mix construction)",
    tags=["text", "sampling", "pipeline"],
)
def doc_length_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample documents with probability ∝ length (capped at 1): the
    token-budget-aware mix rule — longer documents carry more training
    signal, so uniform doc sampling under-weights them. The keep rule is
    pure integer arithmetic on the content-stable hash (P(keep) =
    min(10·n_chars, 10000)/10000), so the sample is reproducible across
    engines/retries and never needs a shuffle — the predicate applies
    at scan time."""
    from write_optimized_vector_database_spark.functions.hashing import portable_hash

    docs = load_table(spark, sf_dir, "documents")
    h = portable_hash(F.concat(F.col("doc_id").cast("string"), F.lit("lenw"))) % 10000
    kept = docs.filter(h < F.least(F.col("n_chars") * 10, F.lit(10000)))
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("lang")
    )


@register(
    "doc_rare_bigram_fraction",
    # integer-exact quality signal: corpus bigram counts, then per-doc
    # fraction of bigrams whose corpus count ≤ 2. The only float op is
    # ONE double division of two exact ints — IEEE-identical anywhere.
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents
),
bgs AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg
  FROM toks, unnest(range(1, len(t))) AS u(i)
),
corpus AS (SELECT bg, COUNT(*) AS c FROM bgs GROUP BY bg),
per_doc AS (
  SELECT b.doc_id,
         COUNT(*) AS n_bigrams,
         SUM(CASE WHEN corpus.c <= 2 THEN 1 ELSE 0 END) AS n_rare
  FROM bgs b JOIN corpus ON corpus.bg = b.bg
  GROUP BY b.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_bigrams, 0)::BIGINT AS n_bigrams,
       COALESCE(p.n_rare, 0)::BIGINT AS n_rare,
       CASE WHEN COALESCE(p.n_bigrams, 0) = 0 THEN 0.0
            ELSE CAST(p.n_rare AS DOUBLE) / p.n_bigrams END AS rare_frac
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
""",
    survey_ref="[EXT] n-gram LM quality scoring (rare-bigram fraction)",
    tags=["text", "quality"],
)
def doc_rare_bigram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gibberish/quality detector: fraction of a document's bigrams that
    are rare in the corpus (count ≤ 2). High fraction → boilerplate
    noise, OCR garbage, or code mis-tagged as prose — the cheap LM-score
    proxy a training-data pipeline runs before a real model pass.

    100 TB shape: one explode + one groupBy on the bigram string (the
    corpus LM), one re-join of bigrams to counts (both sides partial-
    aggregated), all JVM expressions — no Python, no all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
    )
    bgs = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("bg"),
    )
    corpus = bgs.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    per_doc = (
        bgs.join(corpus, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("c") <= 2, 1).otherwise(0)).alias("n_rare"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_rare", F.lit(0)).cast("long").alias("n_rare"),
            F.when(F.coalesce("n_bigrams", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.col("n_rare").cast("double") / F.col("n_bigrams"))
            .alias("rare_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_ngram_contamination_frac",
    # decontamination beyond exact match: per training doc, the fraction
    # of its DISTINCT word 4-grams that appear anywhere in the benchmark
    # probe set (docs 0-19) — the n-gram-overlap check stricter than
    # exact hashing (4-grams chosen so the fixture corpus actually
    # exercises the hit path; production dials to 8-13).
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_aggregate(list_slice(t, i, i + 3), 'string_agg', ' ') AS g
  FROM toks, unnest(range(1, len(t) - 2)) AS u(i)
),
probe AS (SELECT DISTINCT g FROM grams WHERE doc_id < 20),
train AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id >= 20),
hits AS (
  SELECT tr.doc_id,
         COUNT(*) AS n_grams,
         SUM(CASE WHEN probe.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM train tr LEFT JOIN probe ON probe.g = tr.g
  GROUP BY tr.doc_id
)
SELECT doc_id, n_grams::BIGINT AS n_grams, n_hit::BIGINT AS n_hit,
       CAST(n_hit AS DOUBLE) / n_grams AS contamination_frac
FROM hits
WHERE n_hit > 0
ORDER BY doc_id
""",
    survey_ref="[EXT] n-gram-overlap decontamination",
    tags=["text", "dedup", "decontamination"],
)
def doc_ngram_contamination_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by 4-gram overlap: a training document
    is flagged with the fraction of its distinct 4-grams that occur in
    the (broadcast-small) benchmark probe set — catching paraphrase-
    level leakage exact-hash dedup misses.

    100 TB shape: the probe side is tiny and broadcast; the training
    side is one explode + distinct + broadcast-hash left join — the
    train corpus never shuffles on anything wider than (doc_id, hash)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
    )
    grams = toks.filter(F.size("t") >= 4).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 3), "
                "i -> concat_ws(' ', slice(t, i, 4)))"
            )
        ).alias("g"),
    )
    probe = grams.filter(F.col("doc_id") < 20).select("g").distinct()
    train = grams.filter(F.col("doc_id") >= 20).distinct()
    hits = (
        train.join(F.broadcast(probe.withColumn("__hit", F.lit(1))), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hit"),
        )
    )
    return (
        hits.filter(F.col("n_hit") > 0)
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_hit").cast("long").alias("n_hit"),
            (F.col("n_hit").cast("double") / F.col("n_grams")).alias(
                "contamination_frac"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_chunk_windows",
    # RAG chunking: 64-token windows, stride 48 (16-token overlap),
    # stable chunk ids, md5 fingerprint per chunk — md5 of the joined
    # token string makes the whole fan-out hash-checkable.
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents
),
sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
chunks AS (
  SELECT doc_id, j AS chunk_id,
         least(64, n - j * 48)::INT AS n_tokens,
         md5(list_aggregate(list_slice(t, j * 48 + 1, j * 48 + 64),
                            'string_agg', ' ')) AS chunk_md5
  FROM sized,
       unnest(range(0, 1 + (greatest(n - 64, 0) + 47) // 48)) AS u(j)
)
SELECT doc_id, chunk_id, n_tokens, chunk_md5
FROM chunks ORDER BY doc_id, chunk_id
""",
    survey_ref="[EXT] RAG chunking (token windows, stride/overlap)",
    tags=["text", "chunking"],
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RAG chunker: overlapping 64-token windows with
    stride 48 and stable (doc_id, chunk_id) keys — the fan-out that
    feeds embedding + ANN indexing. One narrow projection + one
    generator expression per row; chunk count rides the token count, so
    the output is data-proportional with no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    sized = (
        docs.select(
            "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
        )
        .withColumn("n", F.size("t"))
        .filter(F.col("n") > 0)
    )
    chunks = sized.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, (greatest(n - 64, 0) + 47) div 48), "
                "j -> struct(j AS chunk_id, "
                "CAST(least(64, n - j * 48) AS INT) AS n_tokens, "
                "md5(concat_ws(' ', slice(t, j * 48 + 1, 64))) AS chunk_md5))"
            )
        ).alias("c"),
    )
    return chunks.select(
        "doc_id", "c.chunk_id", "c.n_tokens", "c.chunk_md5"
    ).orderBy("doc_id", "chunk_id")


_HLL_GROUP_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
hashed AS (
  SELECT source,
         ('0x' || substring(md5(CAST(term AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM toks
),
rhos AS (
  SELECT source, h % {_HLL_M} AS bucket,
         CASE WHEN (h >> 8) = 0 THEN 25
              ELSE bit_count(((h >> 8) & (-(h >> 8))) - 1) + 1 END AS rho
  FROM hashed
),
regs AS (SELECT source, bucket, MAX(rho) AS m FROM rhos GROUP BY source, bucket),
merged AS (SELECT '__merged__' AS source, bucket, MAX(m) AS m FROM regs GROUP BY bucket),
allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM merged),
acc AS (
  SELECT source, COUNT(*) AS n_present,
         SUM(1::BIGINT << (25 - m)) AS s_scaled
  FROM allregs GROUP BY source
)
SELECT source, n_present,
       CAST({_HLL_ALPHA_SCALED!r}
            / CAST(s_scaled + ({_HLL_M} - n_present) * 33554432 AS DOUBLE)
         AS DOUBLE) AS hll_estimate
FROM acc ORDER BY source
"""


@register(
    "doc_hll_by_source_merged",
    oracle=_HLL_GROUP_ORACLE,
    survey_ref="[EXT] mergeable sketches — grouped HLL + register-level union",
    tags=["text", "sketch", "agg"],
)
def doc_hll_by_source_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source HLL distinct-token estimates PLUS the register-level
    merge across sources ('__merged__' row) — the property that makes
    sketches the 100 TB answer: per-partition/per-day registers are
    tiny, and the global estimate is a MAX over them, never a re-scan.
    The merged row's estimate is identical to what a single global pass
    would produce (max is associative), and the whole register path is
    integer-exact, so both levels hash-match the oracle."""
    from write_optimized_vector_database_spark.functions.hashing import portable_hash

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    hashed = toks.select("source", portable_hash("term").alias("h"))
    rest = F.shiftright("h", 8)
    rho = F.when(rest == 0, F.lit(25)).otherwise(
        F.bit_count(rest.bitwiseAND(-rest) - 1) + 1
    )
    regs = (
        hashed.select("source", (F.col("h") % _HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("m"))
    )
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("m").alias("m"))
        .select(F.lit("__merged__").alias("source"), "bucket", "m")
    )
    allregs = regs.unionByName(merged)
    acc = allregs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 25 - m)")).alias("s_scaled"),
    )
    return acc.select(
        "source",
        "n_present",
        (
            F.lit(_HLL_ALPHA_SCALED)
            / (
                F.col("s_scaled") + (F.lit(_HLL_M) - F.col("n_present")) * (1 << 25)
            ).cast("double")
        ).alias("hll_estimate"),
    ).orderBy("source")


@register(
    "doc_sequence_packing",
    # sample packing for training: per source, docs are laid head-to-
    # tail in doc_id order and cut into 2048-token bins (concat-then-
    # split packing — boundary docs spill into the next bin, the
    # streaming-packer semantics). Bin assignment is pure integer math
    # on the running token offset.
    oracle=r"""
WITH toks AS (
  SELECT source, doc_id,
         len(string_split_regex(trim(lower(text)), '\s+'))::BIGINT AS n_tokens
  FROM documents
),
offs AS (
  SELECT source, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS start_off
  FROM toks
)
SELECT source, (start_off // 2048)::BIGINT AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,  -- SUM(BIGINT)→HUGEINT→float64 via pandas otherwise
       MIN(doc_id) AS first_doc_id
FROM offs GROUP BY source, bin_id
ORDER BY source, bin_id
""",
    survey_ref="[EXT] training sequence packing (token-budget binning)",
    tags=["text", "packing", "training"],
)
def doc_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 2048-token training sequences: within each
    source, docs are laid out in doc_id order and binned by the running
    token offset — deterministic, restart-stable (no greedy global
    state), and the per-source window is the only wide op.

    100 TB shape: the window partitions by source (bounded state per
    partition, AQE splits skew); packing never materializes token
    arrays, only counts — the actual concat happens downstream in the
    data loader."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = toks.withColumn(
        "start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        offs.groupBy("source", F.expr("start_off div 2048").alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .orderBy("source", "bin_id")
    )


@register(
    "doc_domain_quota_cap",
    # per-domain quota: keep at most QUOTA docs per source, picked by
    # deterministic hash order. The web-crawl cap rule ("no domain may
    # exceed N pages in the mix") as one window.
    oracle="""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'quota'), 1, 8))::BIGINT
           AS h
  FROM documents
),
ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS pick_rank
  FROM keyed
)
SELECT doc_id, source, n_chars, CAST(pick_rank AS BIGINT) AS pick_rank
FROM ranked WHERE pick_rank <= 30
ORDER BY source, pick_rank
""",
    survey_ref="[EXT] per-domain quota sampling (crawl cap rule)",
    tags=["text", "sampling", "pipeline"],
)
def doc_domain_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling: at most 30 documents per source, the
    winners chosen by content-stable hash order (not arrival order, so
    the pick is unbiased and reproducible across engines and retries).

    100 TB shape: a heavy-skew domain never sorts all its rows in one
    task — a salted LOCAL top-quota runs first (the global winners are
    a subset of the union of salt-local winners), so the per-source
    window only sees ≤ quota x n_salts survivor rows per domain. Output
    is bounded at quota x |domains| regardless of corpus size."""
    from pyspark.sql import Window

    from write_optimized_vector_database_spark.functions.hashing import portable_hash

    docs = load_table(spark, sf_dir, "documents")
    h = portable_hash(F.concat(F.col("doc_id").cast("string"), F.lit("quota")))
    keyed = docs.select("doc_id", "source", "n_chars", h.alias("h")).withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(32))
    )
    w_local = Window.partitionBy("source", "salt").orderBy(F.asc("h"), F.asc("doc_id"))
    survivors = (
        keyed.withColumn("lr", F.row_number().over(w_local))
        .filter(F.col("lr") <= 30)
        .drop("lr", "salt")
    )
    w = Window.partitionBy("source").orderBy(F.asc("h"), F.asc("doc_id"))
    return (
        survivors.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("pick_rank") <= 30)
        .select("doc_id", "source", "n_chars", "pick_rank")
        .orderBy("source", "pick_rank")
    )


@register(
    "doc_temperature_mix_sample",
    # temperature-scaled source mixing (alpha = 0.5): keep probability
    # p_s = min(1, 4/sqrt(N_s)) flattens the source distribution the way
    # multilingual/multi-source LM mixes up-weight small sources. The
    # keep rule h * sqrt(N_s) < 40000 is one double multiply + compare
    # on a portable hash — reproducible cross-engine, no rand().
    oracle="""
WITH counts AS (
  SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source
),
keyed AS (
  SELECT d.doc_id, d.source, c.n_total,
         ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || 'temp'), 1, 8))::BIGINT
           % 10000 AS h
  FROM documents d JOIN counts c ON c.source = d.source
),
kept AS (
  SELECT doc_id, source, n_total FROM keyed
  WHERE CAST(h AS DOUBLE) * sqrt(CAST(n_total AS DOUBLE)) < 40000.0
)
SELECT source,
       MAX(n_total) AS n_total,
       COUNT(*) AS n_kept,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM kept GROUP BY source ORDER BY source
""",
    survey_ref="[EXT] temperature-scaled source mixing (alpha=0.5 mix rule)",
    tags=["text", "sampling", "pipeline"],
)
def doc_temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixing at alpha = 0.5: per-source keep probability
    proportional to N_s^(alpha-1) = 1/sqrt(N_s), so post-sample source
    mass is proportional to N_s^alpha — big sources flattened, small
    sources kept whole. sqrt keeps the rule IEEE-identical in both
    engines (no pow()).

    100 TB shape: the per-source count is one tiny aggregate broadcast
    back onto the scan; the keep predicate is then a scan-time filter
    (hash + multiply + compare), so the sample never shuffles the
    corpus itself."""
    from write_optimized_vector_database_spark.functions.hashing import portable_hash

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    h = portable_hash(F.concat(F.col("doc_id").cast("string"), F.lit("temp"))) % 10000
    keyed = docs.join(F.broadcast(counts), "source").select(
        "doc_id", "source", "n_total", h.alias("h")
    )
    kept = keyed.filter(
        F.col("h").cast("double") * F.sqrt(F.col("n_total").cast("double")) < 40000.0
    )
    return (
        kept.groupBy("source")
        .agg(
            F.max("n_total").alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("source")
    )


@register(
    "doc_vocab_coverage_curve",
    # tokenizer-design analytics: what fraction of all token
    # occurrences do the top-N terms cover? Cumulative coverage at
    # checkpoints N in {10, 50, 100, 500}. Integer counts + one double
    # division; rank ties break on the term string.
    oracle=r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents
),
counts AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
ranked AS (
  SELECT term, c,
         row_number() OVER (ORDER BY c DESC, term ASC) AS r,
         SUM(c) OVER (ORDER BY c DESC, term ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER () AS total
  FROM counts
)
SELECT CAST(n.n AS BIGINT) AS top_n,
       MAX(cum)::BIGINT AS covered,
       MAX(total)::BIGINT AS total_tokens,
       CAST(MAX(cum) AS DOUBLE) / MAX(total) AS coverage
FROM ranked, (VALUES (10), (50), (100), (500)) n(n)
WHERE r <= n.n
GROUP BY n.n ORDER BY top_n
""",
    survey_ref="[EXT] vocabulary coverage curve (tokenizer sizing)",
    tags=["text", "analytics", "pipeline"],
)
def doc_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: cumulative share of token mass covered
    by the top-N most frequent terms, at N = 10/50/100/500 — the
    plot that sizes a tokenizer vocabulary (where the curve flattens,
    stop growing the vocab).

    100 TB shape: term counts partial-aggregate map-side; the global
    ordering is taken ONLY over the top max(N) = 500 rows
    (TakeOrderedAndProject heaps, via ranked_top_n) and the running sum
    runs over those 500 — the full |vocab| table is never sorted or
    single-partitioned. The denominator is a separate scalar aggregate
    broadcast back."""
    from pyspark.sql import Window

    from write_optimized_vector_database_spark.operators.topk import ranked_top_n

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c").alias("total"))
    top = ranked_top_n(
        counts, [F.col("c").desc(), F.col("term").asc()], 500, rank_col="r"
    )
    ranked = top.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy(F.desc("c"), F.asc("term")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    ).crossJoin(F.broadcast(total))
    checkpoints = spark.range(0).sparkSession.createDataFrame(
        [(10,), (50,), (100,), (500,)], "n long"
    )
    return (
        ranked.crossJoin(F.broadcast(checkpoints))
        .filter(F.col("r") <= F.col("n"))
        .groupBy(F.col("n").alias("top_n"))
        .agg(
            F.max("cum").alias("covered"),
            F.max("total").alias("total_tokens"),
            (F.max("cum").cast("double") / F.max("total")).alias("coverage"),
        )
        .orderBy("top_n")
    )


@register(
    "emb_dimension_stats",
    # embedding-health telemetry: per-dimension mean / spread / range.
    # Values are floor-quantized to integer micro-units FIRST, so every
    # aggregate is an exact integer sum (float summation order never
    # leaks into the result) — same discipline as the cents columns.
    oracle="""
WITH cells AS (
  SELECT u.i - 1 AS dim,
         CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
           AS v
  FROM embeddings, unnest(range(1, 65)) u(i)
),
agg AS (
  SELECT dim, COUNT(*) AS n, SUM(v) AS s,
         SUM(v::HUGEINT * v::HUGEINT) AS ssq,
         MIN(v) AS vmin, MAX(v) AS vmax
  FROM cells GROUP BY dim
)
SELECT CAST(dim AS INT) AS dim,
       CAST(s AS DOUBLE) / n / 1000000.0 AS mean,
       CAST(n * ssq - s::HUGEINT * s::HUGEINT AS DOUBLE)
         / (CAST(n AS DOUBLE) * n) / 1000000000000.0 AS variance,
       CAST(vmin AS DOUBLE) / 1000000.0 AS vmin,
       CAST(vmax AS DOUBLE) / 1000000.0 AS vmax
FROM agg ORDER BY dim
""",
    survey_ref="[EXT] embedding column health (per-dimension stats, M4-style telemetry)",
    tags=["vector", "analytics", "quality"],
)
def emb_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (mean, population variance,
    min/max) — the drift/dead-dimension monitor for an embedding
    column. Quantizing to integer micro-units before aggregating makes
    the result independent of partitioning and summation order;
    variance comes from the exact (n*ssq - s^2)/n^2 identity in
    DECIMAL(38)/HUGEINT, divided back to float once at the end.

    100 TB shape: posexplode fans out 64x but partial aggregation
    collapses each partition to 64 rows before the single tiny
    shuffle; the output is |dims| rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    d38 = "decimal(38,0)"
    cells = emb.select(
        F.posexplode("embedding").alias("dim", "x")
    ).select(
        "dim",
        F.floor(F.col("x").cast("double") * 1000000.0 + 0.5).cast("long").alias("v"),
    )
    agg = cells.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum((F.col("v").cast(d38) * F.col("v").cast(d38)).cast(d38))
        .cast(d38)
        .alias("ssq"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    var_num = (
        F.col("n").cast(d38) * F.col("ssq")
        - F.col("s").cast(d38) * F.col("s").cast(d38)
    ).cast(d38)
    return agg.select(
        F.col("dim").cast("int").alias("dim"),
        (F.col("s").cast("double") / F.col("n") / 1000000.0).alias("mean"),
        (
            var_num.cast("double")
            / (F.col("n").cast("double") * F.col("n"))
            / 1e12
        ).alias("variance"),
        (F.col("vmin").cast("double") / 1000000.0).alias("vmin"),
        (F.col("vmax").cast("double") / 1000000.0).alias("vmax"),
    ).orderBy("dim")


@register(
    "doc_token_budget_fill",
    # token-budget mix construction: per source, admit docs in
    # content-hash order until the running n_chars total passes the
    # budget (the first doc to CROSS the line is still admitted, so
    # every source with data gets at least one doc). Pure integer
    # cumulative sums — deterministic everywhere.
    oracle="""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'budget'), 1, 8))::BIGINT
           AS h
  FROM documents
),
runs AS (
  SELECT doc_id, source, n_chars,
         SUM(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS running_chars
  FROM keyed
)
SELECT source,
       COUNT(*) AS n_docs,
       MAX(running_chars)::BIGINT AS chars_admitted,
       MIN(doc_id) AS min_doc_id
FROM runs
WHERE running_chars - n_chars < 30000
GROUP BY source ORDER BY source
""",
    survey_ref="[EXT] token-budget mix fill (per-source budget cutoff)",
    tags=["text", "sampling", "pipeline"],
)
def doc_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-capped corpus fill: each source contributes documents in
    deterministic hash order until ~30k chars are admitted (the
    token-budget analog of the doc-count quota). The admit rule
    `running - own < budget` is the standard knapsack-prefix cut: the
    doc that crosses the line is kept, everything after is dropped.

    100 TB shape: one cumulative-sum window per source over integer
    n_chars; the same salt-local pre-prune as the quota cap applies
    when a source is pathologically hot (here the admitted prefix is
    budget-bounded, so the window input can be pre-filtered by any
    upper doc-size bound)."""
    from pyspark.sql import Window

    from write_optimized_vector_database_spark.functions.hashing import portable_hash

    docs = load_table(spark, sf_dir, "documents")
    h = portable_hash(F.concat(F.col("doc_id").cast("string"), F.lit("budget")))
    w = (
        Window.partitionBy("source")
        .orderBy(F.asc("h"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = docs.select("doc_id", "source", "n_chars", h.alias("h")).withColumn(
        "running_chars", F.sum("n_chars").over(w)
    )
    return (
        runs.filter(F.col("running_chars") - F.col("n_chars") < 30000)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("running_chars").alias("chars_admitted"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("source")
    )


# Bloom filter sketch: m = 4096 bits, k = 3 affine probes off ONE md5
# hash (the same trick the CMS uses: products < 2^48, exact BIGINT both
# engines). The filter is a SET of set-bit indices (rows), so build and
# probe are both relational ops.
_BLOOM_M = 4096
_BLOOM_P = 2_147_483_647
_BLOOM_BITS = "((h * (2 * r.r + 3) + (7 * r.r + 1)) % " + str(_BLOOM_P) + ") % " + str(_BLOOM_M)


@register(
    "doc_bloom_membership",
    oracle=f"""
WITH toks AS (
  SELECT DISTINCT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE doc_id >= 5
),
hashed AS (
  SELECT term, ('0x' || substring(md5(CAST(term AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM toks
),
bits AS (
  SELECT DISTINCT {_BLOOM_BITS} AS bit
  FROM hashed, range(3) r(r)
),
probe_terms AS (
  SELECT DISTINCT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE doc_id < 5
  UNION
  SELECT 'zzzneg' || CAST(r.r AS VARCHAR) FROM range(25) r(r)
),
probes AS (
  SELECT term, ('0x' || substring(md5(CAST(term AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM probe_terms
),
probe_bits AS (
  SELECT p.term, {_BLOOM_BITS} AS bit FROM probes p, range(3) r(r)
),
hits AS (
  SELECT pb.term,
         SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS n_set
  FROM probe_bits pb LEFT JOIN bits b ON b.bit = pb.bit
  GROUP BY pb.term
)
SELECT h.term,
       (h.n_set = 3) AS bloom_hit,
       (t.term IS NOT NULL) AS exact_in
FROM hits h LEFT JOIN toks t ON t.term = h.term
ORDER BY h.term
""",
    survey_ref="[EXT] Bloom-filter membership sketch (set-bit relation, k=3 affine probes)",
    tags=["text", "sketch"],
)
def doc_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership: build a 4096-bit filter over the corpus
    vocabulary (docs 5+), probe it with the held-out docs' terms plus 25
    known-absent strings, and report bloom_hit next to ground truth —
    false-positive behavior included, bit-for-bit reproducible (the k
    probe positions derive from one md5 via the affine family).

    100 TB shape: the built filter is at most m = 4096 rows no matter
    the corpus (DISTINCT on a 12-bit value), i.e. broadcastable; probes
    join against it broadcast. Build is one map-side-combined DISTINCT
    — the same shuffle budget as the HLL/CMS siblings."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("doc_id") >= 5)
        .select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
        )
        .distinct()
    )
    from write_optimized_vector_database_spark.functions.hashing import portable_hash

    def bloom_bits(df):
        hashed = df.select("term", portable_hash("term").alias("h"))
        return hashed.select(
            "term",
            F.explode(
                F.array(
                    *[
                        (
                            (F.col("h") * (2 * r + 3) + (7 * r + 1)) % _BLOOM_P
                        )
                        % _BLOOM_M
                        for r in range(3)
                    ]
                )
            ).alias("bit"),
        )

    bits = bloom_bits(toks).select("bit").distinct()
    neg = docs.sparkSession.range(25).select(
        F.concat(F.lit("zzzneg"), F.col("id").cast("string")).alias("term")
    )
    probe_terms = (
        docs.filter(F.col("doc_id") < 5)
        .select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
        )
        .union(neg)
        .distinct()
    )
    hits = (
        bloom_bits(probe_terms)
        .join(F.broadcast(bits.withColumn("set_", F.lit(1))), "bit", "left")
        .groupBy("term")
        .agg(F.sum(F.coalesce("set_", F.lit(0))).alias("n_set"))
    )
    return (
        hits.join(toks.withColumn("in_", F.lit(True)), "term", "left")
        .select(
            "term",
            (F.col("n_set") == 3).alias("bloom_hit"),
            F.coalesce("in_", F.lit(False)).alias("exact_in"),
        )
        .orderBy("term")
    )


@register(
    "doc_leakage_safe_split",
    # train/val/test split where DUPLICATES CO-TRAVEL: the split key is
    # the hash of the duplicate-group representative (min doc_id of the
    # fingerprint group), not of the doc — so a train/test leak through
    # a near-copy is impossible by construction. Corpus includes the
    # synthesized every-3rd-doc copies so the property is exercised.
    oracle=r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0
),
fps AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
  FROM corpus
),
reps AS (SELECT fp, MIN(doc_id) AS rep FROM fps GROUP BY fp),
assigned AS (
  SELECT f.doc_id, f.fp, r.rep,
         ('0x' || substring(md5(CAST(r.rep AS VARCHAR) || 'lsplit'), 1, 8))::BIGINT
           % 10 AS h
  FROM fps f JOIN reps r ON r.fp = f.fp
)
SELECT doc_id, rep,
       CASE WHEN h < 8 THEN 'train' WHEN h < 9 THEN 'val' ELSE 'test' END
         AS split
FROM assigned ORDER BY doc_id
""",
    survey_ref="[EXT] leakage-safe split (duplicate groups co-travel)",
    tags=["text", "sampling", "dedup", "pipeline"],
)
def doc_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split keyed on the duplicate-group REPRESENTATIVE: every
    doc sharing a fingerprint gets the same split, so near-copies can
    never straddle train and test — the contamination mode a per-doc
    hash split cannot prevent.

    100 TB shape: one fingerprint group-by (the dedup shuffle the
    pipeline already pays) and a same-key join back; the split rule is
    then a pure hash function of the representative id, no extra state.
    At scale the group key generalizes to the near-dup cluster id from
    doc_dedup_clusters."""
    from write_optimized_vector_database_spark.functions.hashing import portable_hash
    from write_optimized_vector_database_spark.operators.dedup import fingerprint

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    fps = corpus.select("doc_id", fingerprint("text").alias("fp"))
    reps = fps.groupBy("fp").agg(F.min("doc_id").alias("rep"))
    h = portable_hash(F.concat(F.col("rep").cast("string"), F.lit("lsplit"))) % 10
    return (
        fps.join(reps, "fp")
        .select(
            "doc_id",
            "rep",
            F.when(h < 8, "train").when(h < 9, "val").otherwise("test").alias("split"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_pii_scan_redact",
    # PII scrubbing pre-training: count and redact email-like,
    # SSN-like, and phone-like patterns. The corpus gains synthesized
    # contact lines on every 11th doc so the scrubber has true
    # positives. Patterns use only portable regex constructs
    # (char classes, counted repetition) — identical RE2/Java
    # semantics; the redacted text is witnessed by md5.
    oracle=r"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0
              THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)
                   || '@example.com ssn 123-45-6789 tel 555-867-5309'
              ELSE text END AS text
  FROM documents
),
scanned AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+[.][A-Za-z]+'))::BIGINT AS n_email,
         len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}'))::BIGINT AS n_ssn,
         len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phone,
         md5(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._]+@[A-Za-z0-9.]+[.][A-Za-z]+', '<EMAIL>', 'g'),
             '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
             '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_fp
  FROM corpus
)
SELECT doc_id, n_email, n_ssn, n_phone, redacted_fp
FROM scanned
WHERE n_email + n_ssn + n_phone > 0
ORDER BY doc_id
""",
    survey_ref="[EXT] PII scan + redaction (pattern counts, witnessed rewrite)",
    tags=["text", "quality", "pipeline"],
)
def doc_pii_scan_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: per-document counts of email/SSN/phone-shaped
    spans and the fingerprint of the REDACTED text (so the rewrite
    itself — not just the detection — is hash-witnessed cross-engine).
    Only documents with at least one hit are returned.

    100 TB shape: scan-time regex inside whole-stage codegen, no
    shuffle at all until the final (tiny) ordered output; redaction
    rewrites the column in the same projection. The SSN pattern is
    matched before phone so overlapping digit runs resolve
    deterministically in both engines (identical rewrite order)."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ssn 123-45-6789 tel 555-867-5309"),
        ),
    ).otherwise(F.col("text"))
    email = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+[.][A-Za-z]+"
    ssn = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
    phone = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
    scanned = docs.withColumn("t", text).select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(t, '{email}', 0)")).cast("long").alias("n_email"),
        F.size(F.expr(f"regexp_extract_all(t, '{ssn}', 0)")).cast("long").alias("n_ssn"),
        F.size(F.expr(f"regexp_extract_all(t, '{phone}', 0)")).cast("long").alias("n_phone"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("t"), email, "<EMAIL>"),
                    ssn,
                    "<SSN>",
                ),
                phone,
                "<PHONE>",
            )
        ).alias("redacted_fp"),
    )
    return (
        scanned.filter(F.col("n_email") + F.col("n_ssn") + F.col("n_phone") > 0)
        .orderBy("doc_id")
    )


@register(
    "doc_span_corruption_masks",
    # T5-style span corruption: ~15% of token positions selected by
    # content hash, consecutive picks merged into spans. Pure window
    # arithmetic — the mask layout is a deterministic function of
    # (doc_id, position), reproducible across engines and epochs.
    oracle=r"""
WITH toks AS (
  SELECT doc_id, u.i AS pos,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':'
                                || CAST(u.i AS VARCHAR)), 1, 8))::BIGINT
           % 100 < 15 AS masked
  FROM (
    SELECT doc_id, len(string_split_regex(trim(lower(text)), '\s+')) AS n
    FROM documents
  ) d, unnest(range(0, d.n)) u(i)
),
runs AS (
  SELECT doc_id, pos, masked,
         SUM(CASE WHEN masked THEN 0 ELSE 1 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM toks
),
spans AS (
  SELECT doc_id, run_id, MIN(pos) AS span_start, COUNT(*) AS span_len
  FROM runs WHERE masked GROUP BY doc_id, run_id
)
SELECT doc_id,
       COUNT(*) AS n_spans,
       SUM(span_len)::BIGINT AS n_masked,
       MIN(span_start) AS first_span,
       MAX(span_len) AS max_span_len
FROM spans GROUP BY doc_id ORDER BY doc_id
""",
    survey_ref="[EXT] span-corruption mask generation (T5-style pretraining layout)",
    tags=["text", "pipeline", "training"],
)
def doc_span_corruption_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption layout for denoising pretraining: each token
    position is masked with p = 0.15 by content hash, and adjacent
    masked positions merge into spans (the run-id trick: the running
    count of UNmasked positions is constant exactly within a masked
    run). Per-doc span statistics come out; the same layout regenerates
    anywhere because nothing is random.

    100 TB shape: positions explode from a per-doc sequence (no join),
    the run-id window sorts within each doc only, and the output is one
    row per doc."""
    from pyspark.sql import Window

    from write_optimized_vector_database_spark.functions.hashing import portable_hash

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")) - 1,
            )
        ).alias("pos"),
    ).select(
        "doc_id",
        "pos",
        (
            portable_hash(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"), F.col("pos").cast("string")
                )
            )
            % 100
            < 15
        ).alias("masked"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = toks.withColumn(
        "run_id", F.sum(F.when(F.col("masked"), 0).otherwise(1)).over(w)
    )
    spans = (
        runs.filter(F.col("masked"))
        .groupBy("doc_id", "run_id")
        .agg(F.min("pos").alias("span_start"), F.count(F.lit(1)).alias("span_len"))
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("span_len").alias("n_masked"),
            F.min("span_start").alias("first_span"),
            F.max("span_len").alias("max_span_len"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_code_vs_prose",
    # corpus-curation classifier: separate code from prose with
    # integer character-class evidence (braces/semicolons/operators vs
    # sentence punctuation). The corpus gains synthesized pseudo-code
    # docs (every 13th doc id + 5000000) so both classes exist; the
    # decision rule is pure integer arithmetic on counts.
    oracle=r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 5000000,
         'def fn_' || CAST(doc_id AS VARCHAR)
         || '(x) { if (x > 0) { return x * 2; } else { return 0; } } '
         || '// auto-generated variant ' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 13 = 0
),
feats AS (
  SELECT doc_id,
         length(text)::BIGINT AS n_chars,
         length(regexp_replace(text, '[^{}();=<>*]', '', 'g'))::BIGINT AS n_code_chars,
         length(regexp_replace(text, '[^.!?,]', '', 'g'))::BIGINT AS n_prose_punct
  FROM corpus
)
SELECT doc_id, n_chars, n_code_chars, n_prose_punct,
       (n_code_chars * 50 > n_chars) AS is_code
FROM feats ORDER BY doc_id
""",
    survey_ref="[EXT] code-vs-prose classification (curation gate)",
    tags=["text", "quality", "pipeline"],
)
def doc_code_vs_prose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code/prose separation for corpus curation: code-character density
    (braces, semicolons, comparison/assignment operators) over total
    length, thresholded at 2% with an integer cross-multiplication —
    the cheap router that keeps code out of a prose mix (or routes it
    to a code tokenizer).

    100 TB shape: two regexp_replace character-class counts inside
    whole-stage codegen, zero shuffle until the ordered output."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    code = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.concat(
            F.lit("def fn_"),
            F.col("doc_id").cast("string"),
            F.lit("(x) { if (x > 0) { return x * 2; } else { return 0; } } "),
            F.lit("// auto-generated variant "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    corpus = docs.unionByName(code)
    feats = corpus.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.length(F.regexp_replace("text", r"[^{}();=<>*]", "")).cast("long").alias(
            "n_code_chars"
        ),
        F.length(F.regexp_replace("text", r"[^.!?,]", "")).cast("long").alias(
            "n_prose_punct"
        ),
    )
    return feats.select(
        "doc_id",
        "n_chars",
        "n_code_chars",
        "n_prose_punct",
        (F.col("n_code_chars") * 50 > F.col("n_chars")).alias("is_code"),
    ).orderBy("doc_id")


@register(
    "doc_quality_quantile_filter",
    # per-group learned-threshold filter: each source keeps only docs at
    # or above its own median length — the "filter by a per-domain
    # quantile threshold" pipeline stage (quality cutoffs are usually
    # set per source, not globally). The median interpolates on exact
    # integers, so the threshold — and therefore the kept set — is
    # bit-deterministic.
    oracle="""
WITH med AS (
  SELECT source, quantile_cont(n_chars, 0.5) AS thresh
  FROM documents GROUP BY source
)
SELECT d.source,
       COUNT(*) AS n_kept,
       (SELECT COUNT(*) FROM documents t WHERE t.source = d.source)::BIGINT
         AS n_total,
       MIN(d.n_chars) AS min_kept_chars,
       m.thresh AS thresh
FROM documents d JOIN med m ON m.source = d.source
WHERE CAST(d.n_chars AS DOUBLE) >= m.thresh
GROUP BY d.source, m.thresh
ORDER BY d.source
""",
    survey_ref="[EXT] per-group quantile threshold filter (quality cutoff stage)",
    tags=["text", "agg", "quality", "pipeline"],
)
def doc_quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source median-length cutoff: compute each source's exact
    interpolated median n_chars, keep docs at/above it, report kept
    counts and the threshold — the per-domain quality-gate stage of a
    curation pipeline, with a deterministic threshold.

    100 TB shape: the quantile aggregates per source (map-side
    partials), the |sources|-row threshold frame broadcasts back onto
    the scan, and the filter is a plain comparison — no sort of the
    corpus, no global quantile state."""
    docs = load_table(spark, sf_dir, "documents")
    med = docs.groupBy("source").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("thresh")
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    kept = (
        docs.join(F.broadcast(med), "source")
        .filter(F.col("n_chars").cast("double") >= F.col("thresh"))
        .groupBy("source", "thresh")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("n_chars").alias("min_kept_chars"),
        )
    )
    return (
        kept.join(F.broadcast(totals), "source")
        .select("source", "n_kept", "n_total", "min_kept_chars", "thresh")
        .orderBy("source")
    )
