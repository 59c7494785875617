"""Positional phrase search over posting segments.

The segments already carry per-posting (start, len) position lists
(codec.py stores them delta+varint compressed exactly for this); phrase
evaluation is the standard positional-intersection: join the phrase
terms' postings on doc_id, then chain-match positions so each next term
starts where the previous one ended (+ a separator ``gap`` — 1 for
space-separated corpora, 0 for Japanese text, mirroring how the
reference's found-lexical-item positions are raw char offsets,
myaku/datatypes.py ArticleTextPosition).

Scale shape: segment reads prune by bucket partition + parquet term
pushdown, so only the phrase's terms are scanned; block decode is one
mapInPandas pass; the doc_id equi-joins shrink left-to-right (every
join intersects with another term's doc set) and the position
chain-match is pure Catalyst HOFs (map_from_arrays + try_element_at
inside transform/filter) — no Python touches a position after decode.
Top-k is orderBy().limit() = TakeOrderedAndProject, never a global
window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

POSTINGS_SCHEMA = (
    "term string, doc_id long, tf long, starts array<int>, lens array<int>"
)


def decode_postings(segments: DataFrame, deleted=None) -> DataFrame:
    """Segment block rows → (term, doc_id, tf, starts, lens) postings.

    ``deleted``: optional broadcast of a SORTED int64 doc_id array;
    tombstoned docs are dropped with a vectorized np.isin at decode."""

    def gen(it):
        from myaku_spark.operators.codec import decode_block

        for pdf in it:
            out = {"term": [], "doc_id": [], "tf": [], "starts": [], "lens": []}
            for term, blob in zip(pdf["term"], pdf["blob"]):
                dec = decode_block(bytes(blob), pos_arrays=True)
                ids = dec["doc_ids"].astype(np.int64)
                keep = np.ones(ids.size, dtype=bool)
                if deleted is not None and deleted.value.size:
                    keep = ~np.isin(ids, deleted.value, assume_unique=False)
                ps = dec.get("pos_starts")
                pl = dec.get("pos_lens")
                for j in np.nonzero(keep)[0]:
                    out["term"].append(term)
                    out["doc_id"].append(int(ids[j]))
                    out["tf"].append(int(dec["tfs"][j]))
                    out["starts"].append(
                        ps[j].tolist() if ps is not None else []
                    )
                    out["lens"].append(
                        pl[j].tolist() if pl is not None else []
                    )
            yield pd.DataFrame(out)

    return segments.select("term", "blob").mapInPandas(gen, POSTINGS_SCHEMA)


def phrase_match(
    postings: DataFrame,
    terms: list[str],
    gap: int = 0,
    slop: int = 0,
) -> DataFrame:
    """(doc_id, phrase_tf, match_starts) for docs containing the exact
    term sequence with positional adjacency (next.start == prev.end +
    gap). Candidate chains survive overlapping occurrences and repeated
    phrase terms (each step re-probes that term's own position map).

    ``slop`` > 0 relaxes adjacency to an ordered proximity window:
    next.start ∈ [prev.end + gap, prev.end + gap + slop]. Chains BRANCH
    over every in-window occurrence (a greedy nearest-match would
    wrongly kill chains whose nearer token dead-ends later), and
    match_starts dedups to distinct chain heads.

    Shape: ONE groupBy(doc_id) pivots the phrase terms' postings into a
    per-doc term→positions map, then the whole chain-match is a single
    projection of Catalyst HOFs over that row — no per-term self-joins,
    no branch recomputation of the postings lineage, one shuffle whose
    volume is exactly the phrase terms' postings."""
    if not terms:
        raise ValueError("phrase requires at least one term")
    tm = (
        postings.filter(F.col("term").isin(list(terms)))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.col("term"),
                        F.struct(
                            F.col("starts").alias("starts"),
                            F.col("lens").alias("lens"),
                        ).alias("pos"),
                    )
                )
            ).alias("tm")
        )
    )
    # Conjunctive contract: every phrase term must occur in the doc.
    present = None
    for t in set(terms):
        c = F.col("tm").getItem(t).isNotNull()
        present = c if present is None else (present & c)
    tm = tm.filter(present)
    t0 = F.col("tm").getItem(terms[0])
    cand = F.zip_with(
        t0.getField("starts"),
        t0.getField("lens"),
        lambda a, b: F.struct(a.alias("head"), (a + b).alias("end")),
    )
    for t in terms[1:]:
        ti = F.col("tm").getItem(t)
        if slop == 0:
            # exact adjacency: O(1) map probe per candidate
            pos_map = F.map_from_arrays(
                ti.getField("starts"), ti.getField("lens")
            )
            cand = F.filter(
                F.transform(
                    cand,
                    lambda c: F.struct(
                        c.getField("head").alias("head"),
                        (
                            c.getField("end")
                            + F.lit(gap)
                            + F.try_element_at(
                                pos_map, c.getField("end") + F.lit(gap)
                            )
                        ).alias("end"),
                    ),
                ),
                lambda c: c.getField("end").isNotNull(),
            )
        else:
            # proximity window: branch over every in-window occurrence
            zipped = F.zip_with(
                ti.getField("starts"),
                ti.getField("lens"),
                lambda a, b: F.struct(
                    a.alias("start"), (a + b).alias("end")
                ),
            )
            cand = F.array_distinct(
                F.flatten(
                    F.transform(
                        cand,
                        lambda c: F.transform(
                            F.filter(
                                zipped,
                                lambda p: (
                                    p.getField("start")
                                    >= c.getField("end") + F.lit(gap)
                                )
                                & (
                                    p.getField("start")
                                    <= c.getField("end")
                                    + F.lit(gap + slop)
                                ),
                            ),
                            lambda p: F.struct(
                                c.getField("head").alias("head"),
                                p.getField("end").alias("end"),
                            ),
                        ),
                    )
                )
            )
    heads = F.array_distinct(
        F.transform(cand, lambda c: c.getField("head"))
    )
    return (
        tm.select("doc_id", heads.alias("match_starts"))
        .filter(F.size("match_starts") > 0)
        .select(
            "doc_id",
            F.size("match_starts").cast("long").alias("phrase_tf"),
            "match_starts",
        )
    )


# Skip range pruning when the rarest phrase term itself has more blocks
# than this — the ranges stop being driver-sized and the prune stops
# buying anything (an all-head-term phrase intersects everywhere).
MAX_RANGE_BLOCKS = 4096


def _prune_blocks_to_rarest(segments: DataFrame) -> DataFrame:
    """Conjunctive block prune: any doc matching the whole phrase
    appears in the RAREST term's postings, so blocks of the other terms
    whose [min_doc, max_doc] overlaps none of the rare term's block
    ranges cannot contribute. Metadata-only driver action (<= n_terms
    rows) picks the rare term; its ranges prune via a broadcast
    nested-loop LEFT SEMI join (no duplicate blocks, no giant OR
    predicate). At 10^12 docs this is what keeps a head term's decode
    bounded by the intersection's neighborhood, not its posting list."""
    stats = segments.groupBy("term").agg(
        F.sum("n_postings").alias("tp"), F.count(F.lit(1)).alias("nb")
    ).collect()
    if len(stats) < 2:
        return segments
    rare = min(stats, key=lambda r: (r.tp, r.term))
    if rare.nb > MAX_RANGE_BLOCKS:
        return segments
    ranges = (
        segments.filter(F.col("term") == rare.term)
        .select(
            F.col("min_doc").alias("r_min"), F.col("max_doc").alias("r_max")
        )
    )
    return segments.join(
        F.broadcast(ranges),
        (F.col("min_doc") <= F.col("r_max"))
        & (F.col("max_doc") >= F.col("r_min")),
        "leftsemi",
    )


def phrase_search(
    spark: SparkSession,
    source,
    terms: list[str],
    k: int = 10,
    gap: int = 0,
    slop: int = 0,
    prune: bool = True,
) -> DataFrame:
    """Top-k docs for an exact phrase; ``source`` is an index_dir (reads
    the catalog-resolved segments + tombstones) or a segments DataFrame.
    Ranked by phrase_tf desc, doc_id asc via TakeOrderedAndProject.
    ``prune`` (index_dir path only) applies the rarest-term block-range
    prune before decode; results are provably unchanged (tested)."""
    deleted_bc = None
    if isinstance(source, DataFrame):
        segments = source.filter(F.col("term").isin(list(terms)))
    else:
        from myaku_spark.operators.segments import read_term_segments
        from myaku_spark.plans import catalog
        from myaku_spark.plans.incremental import load_tombstones

        _, paths = catalog.resolve(source)
        segments = read_term_segments(spark, paths["segments"], list(terms))
        if prune:
            segments = _prune_blocks_to_rarest(segments)
        deleted = load_tombstones(spark, source, path=paths["tombstones"])
        if deleted:
            arr = np.sort(
                np.fromiter(deleted, dtype=np.int64, count=len(deleted))
            )
            deleted_bc = spark.sparkContext.broadcast(arr)
    postings = decode_postings(segments, deleted=deleted_bc)
    return phrase_match(postings, terms, gap=gap, slop=slop).orderBy(
        F.desc("phrase_tf"), "doc_id"
    ).limit(k)


def batch_phrase_search(
    spark: SparkSession,
    source,
    queries,
    k: int = 10,
    gap: int = 0,
    slop: int = 0,
) -> DataFrame:
    """N phrase queries evaluated against ONE decode of the union of
    their terms: per-query chain-match plans union into a single
    action (parallel stages over the shared cached postings), top-k
    per query, results materialized driver-side (N×k rows — driver-
    sized by construction) so the postings cache is released before
    returning. ``queries``: list[(query_id, [terms])]. Returns
    (query_id, rank, doc_id, phrase_tf, match_starts)."""
    from pyspark.sql import Window

    all_terms = sorted({t for _, terms in queries for t in terms})
    deleted_bc = None
    if isinstance(source, DataFrame):
        segments = source.filter(F.col("term").isin(all_terms))
    else:
        from myaku_spark.operators.segments import read_term_segments
        from myaku_spark.plans import catalog
        from myaku_spark.plans.incremental import load_tombstones

        _, paths = catalog.resolve(source)
        segments = read_term_segments(spark, paths["segments"], all_terms)
        deleted = load_tombstones(spark, source, path=paths["tombstones"])
        if deleted:
            arr = np.sort(
                np.fromiter(deleted, dtype=np.int64, count=len(deleted))
            )
            deleted_bc = spark.sparkContext.broadcast(arr)
    postings = decode_postings(segments, deleted=deleted_bc).persist()
    per_q = None
    for qid, terms in queries:
        m = phrase_match(postings, list(terms), gap=gap, slop=slop).select(
            F.lit(str(qid)).alias("query_id"),
            "doc_id", "phrase_tf", "match_starts",
        )
        per_q = m if per_q is None else per_q.unionByName(m)
    if per_q is None:
        postings.unpersist()
        if deleted_bc is not None:
            deleted_bc.destroy()
        return spark.createDataFrame(
            [],
            "query_id string, rank int, doc_id long, phrase_tf long,"
            " match_starts array<int>",
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("phrase_tf"), "doc_id"
    )
    rows = (
        per_q.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "phrase_tf", "match_starts")
        .collect()
    )
    postings.unpersist()
    if deleted_bc is not None:
        deleted_bc.destroy()
    return spark.createDataFrame(
        rows,
        "query_id string, rank int, doc_id long, phrase_tf long,"
        " match_starts array<int>",
    )
