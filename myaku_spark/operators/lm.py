"""N-gram language-model perplexity scoring for corpus quality filtering.

The CCNet/Gopher-style curation step: train a small n-gram LM on (a
reference slice of) the corpus, score every document by average token
log-probability, and filter or bucket on perplexity. Here the LM is a
bigram model with add-k smoothing — small enough to stay exact and
engine-independent, big enough to exercise the real Spark shape:

    docs --tokenize (Catalyst split/filter, no Python)-->
    bigram explode --groupBy--> count tables
    docs x bigram explode ⋈ counts (shuffle equi-join on the bigram
    key) --groupBy(doc)--> avg log-prob, perplexity

Scale shape: the count tables are DataFrames, never driver state — at
web scale the bigram table itself is huge and stays distributed; the
score join is a plain shuffle equi-join on (w1, w2) that AQE handles
(skewed head bigrams like "of the" split automatically). An optional
``min_count`` prune keeps the table to the heavy tail exactly the way
production LM filters ship pruned models. No UDFs anywhere — the whole
pipeline is Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from myaku_spark.operators.textstats import WS_SPLIT

BOS = "<s>"


def _tokens(text_col: str) -> Column:
    """Lowercased whitespace tokens with empties dropped, BOS prepended."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), WS_SPLIT), lambda x: x != ""
    )
    return F.concat(F.array(F.lit(BOS)), toks)


def _bigram_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair, BOS-anchored.

    The token array is materialized in its own projection FIRST:
    element_at inside a lambda would otherwise re-evaluate the whole
    split per element (quadratic per doc). sequence() is guarded:
    Spark's sequence(2, 1) would count DOWN, so docs with no tokens
    (array == [BOS]) must map to an empty pair list.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"), _tokens(text_col).alias("t")
    )
    t = F.col("t")
    n = F.size(t)
    idx = F.when(n >= 2, F.sequence(F.lit(2), n)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(t, i - 1).alias("w1"),
            F.element_at(t, i).alias("w2"),
        ),
    )
    return base.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )


class BigramLM:
    """A fitted bigram model: three count DataFrames backed by ONE
    persisted aggregation. bigrams: (w1, w2, c12); contexts: (w1, c1)
    where c1 counts bigram positions (so conditionals normalize
    exactly); vocab: single-row (v) = distinct predicted tokens.

    Fitting is eager (one corpus pass materializes the aggregated
    table; contexts/vocab/pruning derive from the CACHED counts, never
    re-reading the corpus). The model stays resident so it can score
    any number of batches — call release() when done with it."""

    def __init__(self, full: DataFrame, min_count: int):
        from pyspark import StorageLevel

        self._full = full.persist(StorageLevel.MEMORY_AND_DISK)
        self._full.count()
        self.contexts = self._full.groupBy("w1").agg(
            F.sum("c12").alias("c1")
        )
        self.vocab = self._full.agg(F.countDistinct("w2").alias("v"))
        # c1/vocab use the UNPRUNED counts — c1 must stay the true
        # normalizer even when rare bigrams are dropped from the model.
        self.bigrams = (
            self._full.filter(F.col("c12") >= min_count)
            if min_count > 0
            else self._full
        )

    def release(self) -> None:
        self._full.unpersist()


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 0,
) -> BigramLM:
    """Fit a bigram LM over the corpus in one aggregation pass.

    ``min_count`` > 0 prunes rare bigrams (the pruned mass falls back
    to the smoothing floor, exactly like shipping a truncated LM)."""
    pairs = _bigram_pairs(df, text_col, id_col)
    full = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    return BigramLM(full, min_count)


def perplexity(
    df: DataFrame,
    lm: BigramLM,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score docs under the LM: (doc_id, n_bigrams, avg_logprob, ppl).

    P(w2|w1) = (c12 + k) / (c1 + k·V); avg_logprob = mean ln P over the
    doc's bigrams; ppl = exp(-avg_logprob). Unseen bigrams/contexts hit
    the smoothing floor via left joins + coalesce(0). Docs with no
    tokens have no bigrams and drop out (nothing to score)."""
    pairs = _bigram_pairs(df, text_col, id_col)
    scored = (
        pairs.join(lm.bigrams, ["w1", "w2"], "left")
        .join(lm.contexts, "w1", "left")
        .crossJoin(F.broadcast(lm.vocab))
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(float(k)))
                / (
                    F.coalesce(F.col("c1"), F.lit(0))
                    + F.lit(float(k)) * F.col("v")
                )
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("lp"), 3).alias("avg_logprob"),
        F.round(F.exp(-F.avg("lp")), 3).alias("ppl"),
    )
