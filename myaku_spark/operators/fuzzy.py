"""Fuzzy term lookup ("did you mean") over the term dictionary.

Serving-side complement to the index: a misspelled query term is
matched to the nearest dictionary terms by Levenshtein distance,
ranked by (distance, document frequency, term).  The reference engine
resolves query terms by exact dictionary probe only
(myaku/japanese_analysis.py term lookup); this adds the recovery path
a fulltext engine needs when the probe misses.

Scale design (the dictionary is the big side — 10^8+ terms on a
web-scale corpus; the query batch is small):

- The brute-force plan (`prune=False`) broadcasts the query batch and
  scans the dictionary once with a JVM-side ``levenshtein`` — no
  shuffle, linear in |terms|, still 10^10 distance evaluations for a
  100-query batch at web scale.
- The pruned plan (default) applies the lossless q-gram count filter
  (Gravano et al., "Approximate String Joins in a Database (Almost)
  for Free", VLDB 2001): strings within edit distance d share at
  least ``max(|a|,|b|) - q + 1 - q*d`` q-grams (multiset count), so
  candidate pairs come from an equi-join on q-grams with a
  min-multiplicity sum — Levenshtein runs only on candidates.  Where
  the bound is vacuous (both strings shorter than ``q - 1 + q*d``)
  the filter proves nothing, so those short terms join the length
  window directly; the union of both legs is provably every true
  match (``test_fuzzy.py`` pins pruned == brute force).
- Grams shuffle at most ``len(term)`` rows per term; the query side
  of every join is broadcast.  No all-pairs product ever forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _grams_col(col, q: int):
    """Multiset of character q-grams of ``col`` as (gram, cnt) rows.

    Strings shorter than q contribute no grams (the short leg covers
    them).  Implemented with JVM HOFs — no Python in the hot path.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - q + 1, F.lit(0)))
    return F.transform(idx, lambda i: F.substring(col, i, q))


def _explode_grams(df: DataFrame, col: str, q: int) -> DataFrame:
    return (
        df.withColumn("gram", F.explode(_grams_col(F.col(col), q)))
        .groupBy(*df.columns, "gram")
        .agg(F.count(F.lit(1)).cast("int").alias("gram_cnt"))
    )


def fuzzy_term_lookup(
    terms: DataFrame,
    queries: DataFrame,
    max_dist: int = 2,
    k: int = 5,
    q: int = 2,
    prune: bool = True,
) -> DataFrame:
    """Top-k dictionary suggestions per (possibly misspelled) query term.

    terms:   (term string, df long)   — term dictionary with doc freq
    queries: (query_id string, q string)
    Returns (query_id, q, term, dist int, df long), the k terms within
    ``max_dist`` edits ranked by (dist asc, df desc, term asc).
    """
    qdf = queries.select("query_id", F.col("q").alias("qterm"))
    tdf = terms.select("term", "df")

    if not prune:
        pairs = tdf.crossJoin(F.broadcast(qdf))
    else:
        # Lossless candidate generation, two legs.
        # Threshold T = max(|t|,|q|) - q + 1 - q*d; T >= 1 implies the
        # gram-count filter is sound. T <= 0 <=> max(|t|,|q|) <= L0.
        l0 = q - 1 + q * max_dist
        short_t = tdf.filter(F.length("term") <= l0)
        short_q = qdf.filter(F.length("qterm") <= l0)
        leg_short = short_t.join(
            F.broadcast(short_q),
            F.abs(F.length("term") - F.length("qterm")) <= max_dist,
        ).select("term", "df", "query_id", "qterm")

        tg = _explode_grams(tdf, "term", q)
        qg = _explode_grams(qdf, "qterm", q).withColumnRenamed(
            "gram_cnt", "q_gram_cnt"
        )
        leg_gram = (
            tg.join(F.broadcast(qg), "gram")
            .groupBy("term", "df", "query_id", "qterm")
            .agg(
                F.sum(F.least("gram_cnt", "q_gram_cnt")).alias("shared")
            )
            .filter(
                (
                    F.col("shared")
                    >= F.greatest(F.length("term"), F.length("qterm"))
                    - q + 1 - q * max_dist
                )
                & (
                    F.greatest(F.length("term"), F.length("qterm"))
                    > F.lit(l0)
                )
                & (F.abs(F.length("term") - F.length("qterm")) <= max_dist)
            )
            .select("term", "df", "query_id", "qterm")
        )
        pairs = leg_short.unionByName(leg_gram)

    scored = pairs.withColumn(
        "dist", F.levenshtein("term", "qterm").cast("int")
    ).filter(F.col("dist") <= max_dist)
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            F.col("qterm").alias("q"),
            "term",
            "dist",
            F.col("df").cast("long").alias("df"),
        )
    )


def prefix_term_lookup(
    terms: DataFrame,
    queries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Autocomplete: top-k dictionary terms per prefix.

    terms:   (term string, df long)   — term dictionary with doc freq
    queries: (query_id string, prefix string) DataFrame, or a plain
             list of (query_id, prefix) pairs
    Returns (query_id, prefix, rank int, term, df long), the k terms
    extending each prefix ranked by (df desc, term asc).

    Scale shape, two paths. A LIST of prefixes (the interactive
    autocomplete case) becomes one literal ``startswith`` filter leg
    per prefix: on a parquet term dictionary sorted by term on write,
    Catalyst pushes StringStartsWith into PushedFilters and row-group
    min/max statistics prune the scan to the matching range — the
    probe reads O(matching terms), not the dictionary (plan-asserted
    in tests). A DataFrame query set (batch analytics over many
    prefixes) broadcasts against a single dictionary scan instead —
    one plan regardless of prefix count. The per-query window
    partitions by query_id (bounded by k after the filter, never
    corpus-sized); both paths are result-identical (tested).
    """
    if isinstance(queries, (list, tuple)):
        legs = [
            terms.select("term", "df")
            .filter(F.col("term").startswith(p))  # literal → pushdown
            .select(
                F.lit(qid).alias("query_id"),
                F.lit(p).alias("prefix"),
                "term",
                "df",
            )
            for qid, p in queries
        ]
        joined = legs[0]
        for leg in legs[1:]:
            joined = joined.unionByName(leg)
    else:
        joined = terms.select("term", "df").join(
            F.broadcast(queries.select("query_id", "prefix")),
            F.col("term").startswith(F.col("prefix")),
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "prefix",
            F.col("rank").cast("int").alias("rank"),
            "term",
            F.col("df").cast("long").alias("df"),
        )
    )
