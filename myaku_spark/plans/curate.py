"""End-to-end training-data curation pipeline with per-stage metrics.

The standard CCNet/Gopher-shaped funnel over a web corpus:

    input → language filter → min-length → exact dedup (first-writer
    wins) → boilerplate ratio → LM perplexity → per-domain weighted
    sampling

computed as ONE flag projection per doc instead of S sequential
filtered DataFrames: every stage contributes a boolean column, a doc
survives stage s iff the conjunction of flags 1..s holds, and the whole
per-stage survivor funnel is a single aggregation over the flags (no
O(S²) recomputation of stage prefixes, no intermediate materialization).
The only stage whose flag depends on other rows — dedup — is a
skew-safe groupBy(md5(text)).min(doc_id) over upstream survivors
joined back (first-writer-wins with map-side combine — no hot window
partition under viral duplicates).

Scale shape: three equi-joins (dedup winners, boilerplate ratios, LM
scores — each reusing its operator's shuffle shape) and a
hash-threshold sample that is a pure filter. The funnel metrics are one aggregation
row unpivoted with stack().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAGES = [
    "input",
    "lang",
    "min_length",
    "exact_dedup",
    "boilerplate",
    "lm_ppl",
    "domain_sample",
]


def curate_flags(
    docs: DataFrame,
    lang: str = "en",
    min_chars: int = 180,
    bp_k: int = 3,
    bp_min_docs: int = 5,
    bp_max_ratio: float = 0.1,
    ppl_max: float = 33.0,
    weights: dict[str, float] | None = None,
    default_rate: float = 0.3,
    salt: str = "cur0",
    lm=None,
) -> DataFrame:
    """Per-doc stage flags: (doc_id, source, f_lang, f_len, f_dedup,
    f_bp, f_ppl, f_sample). Boilerplate ratios and the LM are computed
    over the FULL input corpus (deterministic and oracle-mirrorable);
    the dedup winner is the min doc_id among docs passing the earlier
    stages.

    ``lm``: pass a pre-fit BigramLM to control its cache lifetime
    (call lm.release() after the flags are materialized); when omitted
    one is fitted here and stays resident (lm.py model-residency
    semantics)."""
    from myaku_spark.operators.dedup import boilerplate_ngrams
    from myaku_spark.operators.lm import perplexity, train_bigram_lm
    from myaku_spark.operators.textstats import rate_column, uniform_hash

    bp = boilerplate_ngrams(
        docs, k=bp_k, min_docs=bp_min_docs, max_ratio=bp_max_ratio
    ).select("doc_id", F.col("keep").alias("_bp_keep"))
    if lm is None:
        lm = train_bigram_lm(docs)
    pp = perplexity(docs, lm).select("doc_id", "ppl")

    f_lang = F.col("lang") == lang
    f_len = F.col("n_chars") >= min_chars
    prev_ok = f_lang & f_len
    # First-writer-wins via groupBy + join rather than a window over
    # md5(text): the aggregation gets a map-side combine, so a virally
    # duplicated page (10^8 copies of one hash at web scale) reduces
    # per-partition before the shuffle instead of funnelling into one
    # hot window partition; the join's build side is one row per hash.
    # md5 coalesced to a sentinel: a NULL text must dedup like any
    # group, not vanish through null-rejecting join equality
    text_hash = F.coalesce(F.md5(F.col("text")), F.lit("~null~"))
    winners = (
        docs.filter(prev_ok)
        .groupBy(text_hash.alias("_h"))
        .agg(F.min("doc_id").alias("_win"))
    )
    f_dedup = F.col("doc_id") == F.col("_win")

    f_sample = uniform_hash(F.col("doc_id"), salt) < rate_column(
        weights, "source", default_rate
    )

    return (
        docs.withColumn("_h", text_hash)
        .join(winners, "_h", "left")
        .join(bp, "doc_id", "left")
        .join(pp, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            f_lang.alias("f_lang"),
            f_len.alias("f_len"),
            f_dedup.alias("f_dedup"),
            # no shingles (short doc) ⇒ nothing boilerplate ⇒ keep
            F.coalesce(F.col("_bp_keep"), F.lit(True)).alias("f_bp"),
            # no bigrams (empty doc) ⇒ unscorable ⇒ drop at the LM stage
            F.coalesce(F.col("ppl") <= ppl_max, F.lit(False)).alias(
                "f_ppl"
            ),
            f_sample.alias("f_sample"),
        )
    )


def curate_metrics(flags: DataFrame) -> DataFrame:
    """(stage_idx, stage, n_docs) — the survivor funnel, one agg row
    unpivoted with stack()."""
    conj = [F.lit(True)]
    for c in ["f_lang", "f_len", "f_dedup", "f_bp", "f_ppl", "f_sample"]:
        conj.append(conj[-1] & F.col(c))
    agg = flags.agg(
        *[
            F.sum(c.cast("long")).alias(f"s{i}")
            for i, c in enumerate(conj)
        ]
    )
    stack_args = ", ".join(
        f"{i}, '{name}', s{i}" for i, name in enumerate(STAGES)
    )
    return agg.select(
        F.expr(
            f"stack({len(STAGES)}, {stack_args})"
        ).alias("stage_idx", "stage", "n_docs")
    )


def curate(docs: DataFrame, flags: DataFrame | None = None, **kwargs) -> DataFrame:
    """Docs surviving every stage (the curated corpus). Pass precomputed
    ``flags`` (e.g. shared with curate_metrics) to avoid refitting."""
    if flags is None:
        flags = curate_flags(docs, **kwargs)
    keep = (
        F.col("f_lang")
        & F.col("f_len")
        & F.col("f_dedup")
        & F.col("f_bp")
        & F.col("f_ppl")
        & F.col("f_sample")
    )
    return docs.join(
        flags.filter(keep).select("doc_id"), "doc_id", "leftsemi"
    )
