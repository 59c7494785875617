"""BM25 scoring + top-k retrieval, and the Myaku rank-key mode.

BM25 (Robertson/Sparck-Jones, the Lucene-standard formulation):

    idf(t)     = ln( (N - df + 0.5) / (df + 0.5) + 1 )
    score(t,d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

All scoring is pure Catalyst column arithmetic — postings join the
(small) per-term stats and per-doc stats, then one expression. Top-k per
term is a window ``row_number`` (TakeOrderedAndProject when a global
LIMIT applies); the WAND evaluator (wand.py) must agree with this
exhaustive path on every query — that is the correctness oracle.

Myaku rank mode reproduces the reference's ranked retrieval contract:
ORDER BY (quality_score DESC, doc_ts DESC, doc_id DESC)
(/root/reference/myaku/datastore/database.py:312-323, ArticleRankKey
 /root/reference/myaku/datatypes.py:134-148), page size 10
(/root/reference/myaku/datastore/__init__.py:22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
PAGE_SIZE = 10  # SEARCH_RESULTS_PAGE_SIZE, datastore/__init__.py:22
MAX_PAGE = 30  # myakuweb/settings.py:98


def idf_col(df_col, n_docs_col):
    return F.log((n_docs_col - df_col + 0.5) / (df_col + 0.5) + 1.0)


def attach_bm25(
    postings: DataFrame,
    tstats: DataFrame,
    dstats: DataFrame,
    cstats: DataFrame,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """postings (term, doc_id, tf) → + bm25 score column.

    Join strategy: postings ⋈ tstats shuffles on term (AQE splits skewed
    head terms); dstats joins on doc_id; cstats is a single row →
    broadcast cross join. At query time prefer ``score_query_terms``
    which broadcasts the tiny query-term slice instead.
    """
    one = F.broadcast(cstats)
    out = (
        postings.join(tstats, "term")
        .join(dstats, "doc_id")
        .crossJoin(one)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    return out.withColumn(
        "bm25",
        idf_col(F.col("df"), F.col("n_docs"))
        * F.col("tf")
        * (k1 + 1.0)
        / denom,
    )


def topk_per_term(
    scored: DataFrame,
    k: int = PAGE_SIZE,
    score_col: str = "bm25",
) -> DataFrame:
    """Exhaustive top-k per term: window row_number over the full rank key.

    Ties broken by doc_id DESC so results are total-ordered and
    deterministic (required for rank-identity checks and as the WAND
    oracle)."""
    w = Window.partitionBy("term").orderBy(
        F.desc(score_col), F.desc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_per_term_myaku(
    scored: DataFrame, k: int = PAGE_SIZE
) -> DataFrame:
    """Myaku rank-key mode: (score DESC, doc_ts DESC, doc_id DESC)."""
    w = Window.partitionBy("term").orderBy(
        F.desc("score"), F.desc("doc_ts"), F.desc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def search_terms(
    spark,
    scored_postings: DataFrame,
    terms: list[str],
    k: int = PAGE_SIZE,
    mode: str = "or",
    score_col: str = "bm25",
) -> DataFrame:
    """Multi-term query: broadcast the query terms, AND/OR combine, top-k.

    OR: per-doc sum of matched-term scores.
    AND (posting-list intersection): docs matching ALL terms — the
    relational formulation of the WAND conjunction; wand.py provides the
    skipping evaluator that must return the same rows.
    """
    qdf = F.broadcast(
        spark.createDataFrame([(t,) for t in terms], ["term"])
    )
    matched = scored_postings.join(qdf, "term")
    agg = matched.groupBy("doc_id").agg(
        F.sum(score_col).alias("query_score"),
        F.count(F.lit(1)).alias("n_matched"),
    )
    if mode == "and":
        agg = agg.filter(F.col("n_matched") == len(set(terms)))
    return (
        agg.orderBy(F.desc("query_score"), F.desc("doc_id")).limit(k)
    )
