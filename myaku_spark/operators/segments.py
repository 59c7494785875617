"""Term-partitioned, block-compressed posting segments (+ merge).

This is the explicit materialization of what MongoDB's compound indexes
gave the reference implicitly (pre-sorted posting lists per term,
/root/reference/myaku/datastore/database.py:296-323), re-designed for a
10^12-doc corpus:

Segment row = one posting BLOCK:
    (bucket, term, block_id, n_postings, min_doc, max_doc,
     max_tf, min_dl, max_score, blob)

- ``bucket`` = pmod(xxhash64(term), N_BUCKETS): the parquet partition
  key → term-partition pruning at query time; parquet min/max +
  dictionary filters prune ``term`` within a bucket.
- Skew split (the north rule's head-term handling): terms with
  df > head_df_threshold are blocked by doc-id RANGE
  (block_id = doc_id div block_doc_range) so a けれども-class head term
  becomes thousands of independently-aggregated blocks — the
  groupBy(term, block_id) key is never hot. Tail terms (the vast
  majority) form one block each via a single grouped aggregation whose
  per-group size is bounded by the threshold.
- Block metadata carries the block-max values WAND needs: exact
  ``max_score`` for the Myaku integer rank mode, and (max_tf, min_dl)
  for a sound BM25 upper bound at query time.
- Blobs are delta+varint+zlib(1) (codec.py); scores stream carries the
  integer payload of the index mode (quality score or dl).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from myaku_spark.operators.codec import decode_block, encode_block

N_BUCKETS = 64
HEAD_DF_THRESHOLD = 4096
BLOCK_DOC_RANGE = 4096

SEGMENT_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("term", StringType()),
        StructField("block_id", LongType()),
        StructField("n_postings", IntegerType()),
        StructField("min_doc", LongType()),
        StructField("max_doc", LongType()),
        StructField("max_tf", IntegerType()),
        StructField("min_dl", LongType()),
        StructField("max_score", LongType()),
        StructField("blob", BinaryType()),
    ]
)


def term_bucket_col(term_col):
    return F.pmod(F.xxhash64(term_col), F.lit(N_BUCKETS)).cast("int")


def _encode_rows(batches):
    """mapInPandas: one row per (term, block) with pre-aggregated primitive
    arrays → one segment row. All heavy lifting is numpy over Arrow
    buffers; no per-posting Python objects."""
    import pandas as pd  # local import for the executor

    from myaku_spark.operators.codec import encode_block_arrays

    for pdf in batches:
        out = []
        has_pos = "pos_starts" in pdf.columns
        for row in pdf.itertuples(index=False):
            doc_ids = np.asarray(row.doc_ids, dtype=np.uint64)
            tfs = np.asarray(row.tfs, dtype=np.uint64)
            payload = np.asarray(row.payloads, dtype=np.int64)
            if has_pos:
                flat_starts = np.concatenate(
                    [np.asarray(a, dtype=np.int64) for a in row.pos_starts]
                ) if len(row.pos_starts) else np.empty(0, dtype=np.int64)
                flat_lens = np.concatenate(
                    [np.asarray(a, dtype=np.int64) for a in row.pos_lens]
                ) if len(row.pos_lens) else np.empty(0, dtype=np.int64)
            else:
                flat_starts = flat_lens = None
            blob = encode_block_arrays(
                doc_ids, tfs, payload, flat_starts, flat_lens
            )
            out.append(
                {
                    "bucket": int(row.bucket),
                    "term": row.term,
                    "block_id": int(row.block_id),
                    "n_postings": int(doc_ids.size),
                    "min_doc": int(doc_ids.min()),
                    "max_doc": int(doc_ids.max()),
                    "max_tf": int(tfs.max()),
                    "min_dl": int(row.min_dl),
                    "max_score": int(payload.max()),
                    "blob": blob,
                }
            )
        yield pd.DataFrame(out)


def build_segments(
    scored_postings: DataFrame,
    payload_col: str = "score",
    head_df_threshold: int = HEAD_DF_THRESHOLD,
    block_doc_range: int = BLOCK_DOC_RANGE,
    with_positions: bool = True,
) -> DataFrame:
    """postings (term, doc_id, tf[, positions], payload[, dl]) → segment rows.

    Two-path skew split on per-term df, then one applyInPandas over
    (term, block_id) groups — a shuffle whose hottest key holds at most
    max(head block population, head_df_threshold) rows.
    """
    tstats = scored_postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    p = (
        scored_postings.withColumnRenamed(payload_col, "payload")
        .join(tstats, "term")
        .withColumn("bucket", term_bucket_col(F.col("term")))
    )
    head = p.filter(F.col("df") > head_df_threshold).withColumn(
        "block_id", (F.col("doc_id") / F.lit(block_doc_range)).cast("long")
    )
    tail = p.filter(F.col("df") <= head_df_threshold).withColumn(
        "block_id", F.lit(0).cast("long")
    )
    cols = ["bucket", "term", "block_id", "doc_id", "tf", "payload"]
    has_pos = with_positions and "positions" in p.columns
    if has_pos:
        cols.append("positions")
    has_dl = "dl" in p.columns
    if has_dl:
        cols.append("dl")
    both = head.select(*cols).unionByName(tail.select(*cols))

    # JVM-side block assembly: sort postings into one struct list per
    # (term, block), then peel aligned primitive arrays with transform()
    # so Arrow ships plain int lists (no per-posting Python objects).
    struct_fields = [F.col("doc_id"), F.col("tf"), F.col("payload")]
    if has_pos:
        struct_fields.append(F.col("positions"))
    agg = both.groupBy("term", "block_id").agg(
        F.first("bucket").alias("bucket"),
        (F.min("dl") if has_dl else F.min(F.lit(0))).alias("min_dl"),
        F.array_sort(F.collect_list(F.struct(*struct_fields))).alias("plist"),
    )
    sel = [
        "term",
        "block_id",
        "bucket",
        "min_dl",
        F.expr("transform(plist, x -> x.doc_id)").alias("doc_ids"),
        F.expr("transform(plist, x -> x.tf)").alias("tfs"),
        F.expr("transform(plist, x -> x.payload)").alias("payloads"),
    ]
    if has_pos:
        sel.append(
            F.expr(
                "transform(plist, x -> transform(x.positions, p -> p.start))"
            ).alias("pos_starts")
        )
        sel.append(
            F.expr(
                "transform(plist, x -> transform(x.positions, p -> p.len))"
            ).alias("pos_lens")
        )
    return agg.select(*sel).mapInPandas(_encode_rows, SEGMENT_SCHEMA)


def write_segments(segments: DataFrame, path: str, mode: str = "overwrite"):
    """Parquet partitioned by bucket; sorted by term within files so
    parquet row-group min/max stats prune term lookups."""
    (
        segments.repartition("bucket")
        .sortWithinPartitions("term", "block_id")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )


def read_term_segments(spark, path: str, terms: list[str]) -> DataFrame:
    """Read only the buckets/rows of the query terms (partition pruning +
    parquet predicate pushdown on term)."""
    buckets = list(
        {
            r.bucket
            for r in spark.createDataFrame([(t,) for t in terms], ["term"])
            .select(term_bucket_col(F.col("term")).alias("bucket"))
            .collect()
        }
    )
    df = spark.read.parquet(path)
    return df.filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))


def segment_catalog(segments: DataFrame, run_id: str) -> DataFrame:
    """Catalog rows (FIXTURES.md §5): per-bucket segment stats + lineage."""
    return segments.groupBy("bucket").agg(
        F.min("term").alias("min_term"),
        F.max("term").alias("max_term"),
        F.countDistinct("term").alias("n_terms"),
        F.sum("n_postings").cast("long").alias("n_postings"),
        F.sum(F.length("blob")).cast("long").alias("bytes"),
        F.count(F.lit(1)).alias("n_blocks"),
    ).withColumn("created_by_run", F.lit(run_id))


def _merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """k-way merge of same-(term, block_id) segment rows from multiple
    runs: decode, concat, newest-run-wins per doc_id, re-encode.

    Rows arrive with a ``run_order`` column (higher = newer)."""
    if len(pdf) == 1:
        return pdf.drop(columns=["run_order"])
    pdf = pdf.sort_values("run_order")
    by_doc: dict[int, tuple] = {}
    for _, row in pdf.iterrows():
        dec = decode_block(row["blob"])
        pos = dec.get("positions")
        for i, d in enumerate(dec["doc_ids"]):
            by_doc[int(d)] = (
                int(dec["tfs"][i]),
                int(dec["scores"][i]) if "scores" in dec else 0,
                pos[i] if pos is not None else None,
            )
    doc_ids = np.array(sorted(by_doc), dtype=np.uint64)
    tfs = np.array([by_doc[d][0] for d in doc_ids], dtype=np.uint64)
    scores = np.array([by_doc[d][1] for d in doc_ids], dtype=np.int64)
    positions = None
    if by_doc and by_doc[int(doc_ids[0])][2] is not None:
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
                "max_score": int(scores.max()) if len(scores) else 0,
                "blob": blob,
            }
        ]
    )


def merge_segments(runs: list[DataFrame]) -> DataFrame:
    """Sorted k-way merge of segment sets from successive runs (newer
    runs listed later win per-doc — the reference's replace-on-rewrite
    upsert semantics, database.py:396-434)."""
    tagged = [
        df.withColumn("run_order", F.lit(i).cast("int")) for i, df in enumerate(runs)
    ]
    allseg = tagged[0]
    for t in tagged[1:]:
        allseg = allseg.unionByName(t)
    return allseg.groupBy("term", "block_id").applyInPandas(
        _merge_group, SEGMENT_SCHEMA
    )
