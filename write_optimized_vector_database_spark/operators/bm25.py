"""BM25-style lexical scoring + reciprocal-rank-fusion hybrid search
(Robertson's BM25 and RRF, public knowledge — the lexical half of the
hybrid search every vector store pairs with ANN).

Cross-engine float discipline (the repo rule that makes these
hash-checkable):

- **Rational idf.** Standard BM25 idf uses ln(); JVM `Math.log` and
  libm `log` are only 1-ulp-accurate, not correctly-rounded, so a hash
  gate cannot cross that boundary. We use the un-logged odds ratio
  idf_t = (N − df_t + 0.5)/(df_t + 0.5) — a strictly monotone transform
  of the classic idf, so rankings keep BM25's character while every op
  stays +,−,×,÷ over integer-derived doubles (bit-identical everywhere).
- **Fixed-order term sums.** Per-query scores sum one pivot column per
  query term, left-associated, never a float groupBy-SUM whose order is
  partition-dependent.
- **RRF** contributions 1/(K + rank) are doubles of small ints.

Scale shape: tf/df/dl are plain groupBy aggregations with map-side
partials (one shuffle each over (doc, term) / term / doc); per-query
scoring joins the weights table on an isin(terms) filter that pushes to
the scan; fusion is a join of two rank lists already cut to top-N.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.topk import ranked_top_n

RRF_K = 60


def tokenize(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term) rows — whitespace tokens of lowercased text, the
    same normalization as textops token counts (oracle-proven split)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    )


def bm25_weights(
    docs: DataFrame, k1: float = 1.2, b: float = 0.75,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, term, w): per-(doc, term) BM25 weight with rational idf.

    w = idf_t · tf / (tf + k1·(1 − b + b·dl/avgdl)),
    idf_t = (N − df_t + 0.5)/(df_t + 0.5).

    N, tf, df, dl are exact integers; avgdl = Σdl/N is one double
    division — every engine computes the identical doubles.
    """
    toks = tokenize(docs, text_col, id_col)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs, sum_dl = dl.agg(F.count(F.lit(1)), F.sum("dl")).first()
    avgdl = sum_dl / n_docs  # exact ints → one double division
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .select("doc_id", "term", (idf * F.col("tf") / denom).alias("w"))
    )


def bm25_query_scores(
    weights: DataFrame, query_id: int, terms: list[str]
) -> DataFrame:
    """(query_id, doc_id, score) for one term-list query: pivot one
    column per term (missing term → 0.0) and sum left-to-right in the
    given term order — the order-pinned analog of Σ_{t∈q} w(t, d)."""
    per_term = (
        weights.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .pivot("term", terms)
        .agg(F.first("w"))
    )
    cols = [F.coalesce(F.col(f"`{t}`"), F.lit(0.0)) for t in terms]
    score = reduce(lambda a, c: a + c, cols)
    return per_term.select(
        F.lit(query_id).alias("query_id"),
        "doc_id",
        score.alias("score"),
    ).filter(F.col("score") > 0.0)


def rrf_fuse(
    ranked_a: DataFrame, ranked_b: DataFrame, k: int = RRF_K
) -> DataFrame:
    """Fuse two (query_id, doc_id, rank) lists: rrf = Σ 1/(k + rank),
    absent list ⇒ 0 contribution. Returns (query_id, doc_id, rrf)."""
    a = ranked_a.select("query_id", "doc_id", F.col("rank").alias("rank_a"))
    b = ranked_b.select("query_id", "doc_id", F.col("rank").alias("rank_b"))
    joined = a.join(b, ["query_id", "doc_id"], "full_outer")
    contrib_a = F.when(
        F.col("rank_a").isNotNull(), F.lit(1.0) / (F.lit(float(k)) + F.col("rank_a"))
    ).otherwise(F.lit(0.0))
    contrib_b = F.when(
        F.col("rank_b").isNotNull(), F.lit(1.0) / (F.lit(float(k)) + F.col("rank_b"))
    ).otherwise(F.lit(0.0))
    return joined.select(
        "query_id", "doc_id", (contrib_a + contrib_b).alias("rrf")
    )


def bm25_batch_scores(
    weights: DataFrame, queries: list[tuple[int, list[str]]]
) -> DataFrame:
    """(query_id, doc_id, score) for a BATCH of term-list queries in ONE
    pass over the weights table (vs one scan+shuffle per query).

    The query terms become a broadcast literal (query_id, term, pos)
    frame; one join + one pivot on pos computes every query's pinned-
    order sum Σ w(t_pos0) + w(t_pos1) + … — positions missing for a
    query contribute +0.0, which is bit-neutral for the non-negative w.
    """
    spark = weights.sparkSession
    max_terms = max(len(t) for _, t in queries)
    qterms = spark.createDataFrame(
        [(qid, t, i) for qid, terms in queries for i, t in enumerate(terms)],
        "query_id long, term string, pos int",
    )
    joined = weights.join(F.broadcast(qterms), "term").select(
        "query_id", "doc_id", "pos", "w"
    )
    wide = (
        joined.groupBy("query_id", "doc_id")
        .pivot("pos", list(range(max_terms)))
        .agg(F.first("w"))
    )
    cols = [F.coalesce(F.col(str(i)), F.lit(0.0)) for i in range(max_terms)]
    score = reduce(lambda a, c: a + c, cols)
    return wide.select("query_id", "doc_id", score.alias("score")).filter(
        F.col("score") > 0.0
    )
