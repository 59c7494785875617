"""Incremental re-index + recency rescore (SURVEY §3.3 / Phase 5).

Incremental semantics (S4/J4/S6, /root/reference/myaku/crawlers/
crawl_track.py:89-129 + datastore/index_build.py:116-143):

- a page whose (url, text_hash) already exists in the docs table is
  UNCHANGED → skipped (the reference's crawl-skip anti-join);
- a new url → indexed as a new doc;
- an existing url with a different text_hash → re-indexed as a new doc
  and the old doc_id is TOMBSTONED (the reference's upsert-replace,
  database.py:396-434). Tombstones are a delete-vector parquet the
  searcher applies at block-decode time — the merge-on-read model
  Iceberg uses for row-level deletes.

The delta is built as a fresh partition group (id = max existing + 1),
so incremental runs compose with resumable checkpoints and the segment
layout; a compaction pass can later merge_segments() delta groups into
the base groups.

Rescore (A7/A8, index_rescore.py:40-53,136-180): recompute quality
scores for docs whose recency bucket changed between two 'now' instants,
and rebuild only the partition groups containing affected docs —
partition-pruned rescoring instead of a full rebuild.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myaku_spark.operators.scoring import RECENCY_BUCKETS
from myaku_spark.plans.build_index import (
    _group_col,
    build_group,
    extract_and_dedupe,
)

DELTA_GROUP_BASE = 10_000  # delta groups live above base group ids


def _existing_docs(spark: SparkSession, index_dir: str) -> DataFrame:
    from myaku_spark.plans import catalog

    return spark.read.parquet(catalog.path_of(index_dir, "docs"))


def detect_changes(
    spark: SparkSession, index_dir: str, new_pages: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Returns (changed_pages, tombstones).

    changed_pages: pages that are new urls or changed content.
    tombstones: doc_ids of superseded versions (url re-indexed).

    Skip decisions consult only LIVE (non-tombstoned) docs: a url whose
    content reverts to a previously-indexed-then-superseded text_hash
    must be RE-indexed, not skipped, or it would stay masked by the old
    tombstone forever (the reference's replace-on-write never loses the
    live copy, database.py:396-434). Content dedup is db-wide, matching
    can_store_article (datastore/index_build.py:116-143): a page whose
    text_hash exists under ANY live url is skipped (first-writer-wins
    across the whole corpus)."""
    from myaku_spark.plans import catalog

    docs = _existing_docs(spark, index_dir).select("doc_id", "url", "text_hash")
    tomb_path = catalog.path_of(index_dir, "tombstones")
    if catalog.parquet_exists(tomb_path):
        tombs = spark.read.parquet(tomb_path).select("doc_id")
        live = docs.join(tombs, "doc_id", "left_anti")
    else:
        live = docs
    # Hash the CANONICAL (extracted) text — the same bytes the index
    # stores — not the shipped text column, else a page whose html is
    # unchanged would be re-detected forever.
    canonical = extract_and_dedupe(new_pages).select("url", "text_hash")
    changed_urls = (
        canonical.join(
            live.select("url", "text_hash"), ["url", "text_hash"], "left_anti"
        )
        # db-wide content dedup: identical text under a different live
        # url is not re-indexed.
        .join(live.select("text_hash"), "text_hash", "left_anti")
        .select("url")
    )
    changed = new_pages.join(changed_urls, "url", "left_semi")
    # Tombstones: old doc_ids of urls being re-indexed.
    tomb = live.join(changed.select("url"), "url", "left_semi").select("doc_id")
    return changed, tomb


def incremental_update(
    spark: SparkSession,
    index_dir: str,
    new_pages: DataFrame,
    now: str,
    lexicon: set | None = None,
    blogs: DataFrame | None = None,
    blog_map: DataFrame | None = None,
) -> dict | None:
    """Index only changed/new pages; tombstone superseded docs.

    Returns the delta group's metrics row, or None when nothing changed."""
    from myaku_spark.plans import catalog

    changed, tomb = detect_changes(spark, index_dir, new_pages)
    if changed.limit(1).count() == 0:
        return None
    meta = spark.read.parquet(f"{index_dir}/build_meta").collect()[0]
    if catalog.parquet_exists(f"{index_dir}/checkpoints"):
        prev = spark.read.parquet(f"{index_dir}/checkpoints")
        max_group = prev.agg(F.max("group")).collect()[0][0]
    else:
        max_group = -1
    group = max(int(max_group) + 1, DELTA_GROUP_BASE)
    row = build_group(
        spark,
        changed,
        index_dir,
        group,
        run_id=f"incr-{int(time.time())}",
        now=now,
        lexicon=lexicon,
        id_offset=group * (1 << 40),
        mode=meta.mode,
        blogs=blogs,
        blog_map=blog_map,
    )
    row["status"] = "incremental"
    spark.createDataFrame([row]).withColumn(
        "completed_ts", F.current_timestamp()
    ).write.mode("append").parquet(f"{index_dir}/checkpoints")
    tomb.write.mode("append").parquet(catalog.path_of(index_dir, "tombstones"))
    # Refresh corpus stats from LIVE docs (docs minus tombstones), the
    # same way compact_index does — summing checkpoint rows would keep
    # counting superseded docs and drift n_docs/avgdl upward with every
    # re-index, skewing BM25 idf and length normalization.
    live = _existing_docs(spark, index_dir).join(
        spark.read.parquet(catalog.path_of(index_dir, "tombstones")).select(
            "doc_id"
        ),
        "doc_id",
        "left_anti",
    )
    live.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ).write.mode("overwrite").parquet(f"{index_dir}/corpus_stats")
    return row


def load_tombstones(spark: SparkSession, index_dir: str) -> set[int]:
    from myaku_spark.plans import catalog

    path = catalog.path_of(index_dir, "tombstones")
    if not catalog.parquet_exists(path):
        return set()
    return {r.doc_id for r in spark.read.parquet(path).collect()}


def _recency_days(ts_col, now_col):
    return F.floor(
        (now_col.cast("timestamp").cast("double") - ts_col.cast("double"))
        / F.lit(86400.0)
    )


def _recency_bucket(days_col):
    expr = None
    for i, (upper, _) in enumerate(RECENCY_BUCKETS):
        if upper is None:
            expr = expr.otherwise(F.lit(i))
        else:
            cond = days_col <= F.lit(upper)
            expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    return expr


def docs_needing_rescore(
    docs: DataFrame, old_now: str, new_now: str
) -> DataFrame:
    """A8 boundary-window scan: docs whose recency bucket differs between
    the two instants (index_rescore.py:136-180 semantics — only
    tier-boundary crossers are touched)."""
    old_b = _recency_bucket(_recency_days(F.col("doc_ts"), F.lit(old_now)))
    new_b = _recency_bucket(_recency_days(F.col("doc_ts"), F.lit(new_now)))
    return docs.filter(old_b != new_b)


def rescore_index(
    spark: SparkSession,
    index_dir: str,
    pages: DataFrame,
    new_now: str,
    lexicon: set | None = None,
) -> list[int]:
    """Partition-pruned rescore: rebuild only groups containing
    boundary-crossing docs, with the new 'now'. Returns rebuilt groups."""
    meta = spark.read.parquet(f"{index_dir}/build_meta").collect()[0]
    docs = _existing_docs(spark, index_dir)
    affected = docs_needing_rescore(docs, meta.now, new_now)
    n_groups = int(meta.n_groups)
    groups = sorted(
        r.g
        for r in affected.select(
            _group_col(F.col("url"), n_groups).alias("g")
        )
        .distinct()
        .collect()
    )
    tagged = pages.withColumn("_group", _group_col(F.col("url"), n_groups))
    # Guard ALL groups BEFORE rebuilding any: rebuilding re-runs dense id
    # assignment, so each group's (url, text_hash) membership must be
    # UNCHANGED since the original build — otherwise ids shift under
    # existing tombstones and delta segments, which would mask the wrong
    # documents. A changed group must go through incremental_update
    # (+ compaction) first. Validating up front also keeps the docs scan
    # consistent (rebuilds overwrite docs/group=G mid-loop).
    for g in groups:
        grp_pages = tagged.filter(F.col("_group") == g).drop("_group")
        canonical = extract_and_dedupe(grp_pages).select("url", "text_hash")
        stored = docs.filter(F.shiftright(F.col("doc_id"), 40) == g).select(
            "url", "text_hash"
        )
        n_extra = canonical.join(
            stored, ["url", "text_hash"], "left_anti"
        ).count()
        n_missing = stored.join(
            canonical, ["url", "text_hash"], "left_anti"
        ).count()
        if n_extra or n_missing:
            raise ValueError(
                f"rescore_index: group {g} membership changed "
                f"({n_extra} new, {n_missing} gone) — run "
                "incremental_update + compact_index before rescoring"
            )
    for g in groups:
        build_group(
            spark,
            tagged.filter(F.col("_group") == g).drop("_group"),
            index_dir,
            g,
            run_id=f"rescore-{int(time.time())}",
            now=new_now,
            lexicon=lexicon,
            id_offset=g * (1 << 40),
            mode=meta.mode,
        )
    # Record the new scoring instant.
    spark.createDataFrame(
        [(n_groups, str(new_now), meta.mode, f"rescore-{int(time.time())}")],
        ["n_groups", "now", "mode", "run_id"],
    ).write.mode("overwrite").parquet(f"{index_dir}/build_meta")
    return groups
