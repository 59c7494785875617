"""Compaction: fold incremental delta groups + tombstones back into a
clean segment set (the k-way sorted segment merge, SURVEY §4 custom
work #3 — the reference delegates this to MongoDB upserts S6).

- merge_segments() joins same-(term, block) segment rows across groups
  (newest run wins per doc — upsert-replace semantics);
- tombstoned postings are dropped during the merge re-encode;
- the docs table is rewritten without tombstoned rows;
- tombstones are cleared and corpus stats refreshed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myaku_spark.operators.codec import decode_block, encode_block
from myaku_spark.operators.segments import SEGMENT_SCHEMA, write_segments


def _merge_with_tombstones(deleted):
    """``deleted``: a set/frozenset of doc ids (driver-sized delete
    vectors, shipped in the closure), or None when the rows carry their
    own per-block ``del_ids`` arrays (df-mode: the vector stayed
    distributed and arrived via tombstone_block_patches)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        local = deleted if deleted is not None else frozenset()
        if "del_ids" in pdf.columns:
            s = set()
            for a in pdf["del_ids"]:
                if isinstance(a, (list, np.ndarray)):
                    s.update(int(x) for x in a)
            local = s if deleted is None else (s | set(deleted))
        pdf = pdf.sort_values("run_order")
        by_doc: dict[int, tuple] = {}
        for _, row in pdf.iterrows():
            dec = decode_block(bytes(row["blob"]))
            pos = dec.get("positions")
            for i, d in enumerate(dec["doc_ids"]):
                d = int(d)
                if d in local:
                    by_doc.pop(d, None)
                    continue
                by_doc[d] = (
                    int(dec["tfs"][i]),
                    int(dec["scores"][i]) if "scores" in dec else 0,
                    pos[i] if pos is not None else None,
                )
        if not by_doc:
            return pd.DataFrame(
                [], columns=[f.name for f in SEGMENT_SCHEMA.fields]
            )
        doc_ids = np.array(sorted(by_doc), dtype=np.uint64)
        tfs = np.array([by_doc[int(d)][0] for d in doc_ids], dtype=np.uint64)
        scores = np.array([by_doc[int(d)][1] for d in doc_ids], dtype=np.int64)
        positions = None
        if by_doc[int(doc_ids[0])][2] is not None:
            positions = [by_doc[int(d)][2] for d in doc_ids]
        blob = encode_block(doc_ids, tfs, scores, positions)
        first = pdf.iloc[-1]
        return pd.DataFrame(
            [
                {
                    "bucket": int(first["bucket"]),
                    "term": first["term"],
                    "block_id": int(first["block_id"]),
                    "n_postings": len(doc_ids),
                    "min_doc": int(doc_ids.min()),
                    "max_doc": int(doc_ids.max()),
                    "max_tf": int(tfs.max()),
                    "min_dl": int(pdf["min_dl"].min()),
                    "max_score": int(scores.max()),
                    "sum_tf": int(tfs.sum()),
                    "blob": blob,
                }
            ]
        )

    return merge


def compact_index(
    spark: SparkSession, index_dir: str, gc_old: bool = True
) -> dict:
    """Merge all segment groups into group=0, applying tombstones.

    Snapshot-atomic: the merged segments and rewritten docs land in NEW
    versioned directories, then one catalog publish (os.replace) makes
    them live. Readers mid-compaction keep resolving the previous
    version's consistent (segments, docs, tombstones) triple; the new
    version starts with an empty tombstone set (every tombstone was
    applied in the merge). Old versions older than the previous one are
    garbage-collected after publish."""
    import os

    from myaku_spark.plans import catalog
    from myaku_spark.plans.incremental import (
        resolve_tombstones,
        tombstone_block_patches,
    )

    cat, paths = catalog.resolve(index_dir)
    version = int(cat["version"]) + 1
    # Size-guarded delete vector (r4 verdict #2): driver-sized sets ship
    # in the merge closure as before; larger sets stay a DataFrame —
    # per-block del_ids ride the rows via the binned interval join and
    # the docs rewrite anti-joins distributively.
    tmode, tpayload = resolve_tombstones(
        spark, index_dir, path=paths["tombstones"]
    )
    deleted = frozenset(int(d) for d in tpayload) if tmode == "array" else None
    n_deleted = len(deleted) if deleted is not None else (
        int(tpayload.count()) if tmode == "df" else 0
    )
    segs = spark.read.parquet(paths["segments"]).withColumn(
        "run_order", F.col("group").cast("int")
    )
    if tmode == "df":
        patches = tombstone_block_patches(
            segs.select(
                "group", "bucket", "term", "block_id", "min_doc", "max_doc"
            ),
            tpayload,
        )
        segs = segs.join(
            patches, ["group", "bucket", "term", "block_id"], "left"
        )
    merged = segs.groupBy("term", "block_id").applyInPandas(
        _merge_with_tombstones(deleted), SEGMENT_SCHEMA
    )
    seg_rel = f"segments_v{version}"
    docs_rel = f"docs_v{version}"
    write_segments(merged, f"{index_dir}/{seg_rel}/group=0")

    docs = spark.read.parquet(paths["docs"])
    if deleted:
        tomb_df = spark.createDataFrame(
            [(int(d),) for d in deleted], ["doc_id"]
        )
        docs = docs.join(F.broadcast(tomb_df), "doc_id", "left_anti")
    elif tmode == "df":
        docs = docs.join(tpayload, "doc_id", "left_anti")
    if "group" in docs.columns:
        docs = docs.drop("group")
    docs.write.mode("overwrite").parquet(f"{index_dir}/{docs_rel}/group=0")

    # Post-merge stats are recomputed into NEW versioned dirs before the
    # publish, so a reader mid-compaction never sees stats inconsistent
    # with its snapshot (it keeps resolving the previous entry).
    # term_stats: df = postings per term (one posting = one doc),
    # cf = sum of tfs — both exact from merged block metadata, no decode.
    ts_rel = f"term_stats_v{version}"
    merged_read = spark.read.parquet(f"{index_dir}/{seg_rel}")
    merged_read.groupBy("term").agg(
        F.sum("n_postings").cast("long").alias("df"),
        F.sum("sum_tf").cast("long").alias("cf"),
    ).write.mode("overwrite").parquet(f"{index_dir}/{ts_rel}/group=0")

    cs_rel = f"corpus_stats_v{version}"
    stats = spark.read.parquet(f"{index_dir}/{docs_rel}").agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs = int(stats.n_docs)
    spark.createDataFrame(
        [(n_docs, float(stats.avgdl or 0.0))], ["n_docs", "avgdl"]
    ).write.mode("overwrite").parquet(f"{index_dir}/{cs_rel}")

    # The atomic commit point.
    entry = {
        "version": version,
        "segments": seg_rel,
        "docs": docs_rel,
        "tombstones": f"tombstones_v{version}",
        "term_stats": ts_rel,
        "corpus_stats": cs_rel,
        "previous": cat,
    }
    catalog.publish(index_dir, entry)
    if gc_old:
        keep = {
            e[c]
            for e in (entry, cat)
            for c in catalog.COMPONENTS
            if os.sep not in e[c]
        }
        catalog.gc_names(index_dir, keep)
    return {
        "n_docs": n_docs,
        "tombstones_applied": n_deleted,
        "version": version,
    }
