"""Streaming incremental indexing: new page files → incremental index.

The reference has no streaming (crawls are cron batches, SURVEY §2.9);
its incremental semantics (only changed pages re-analyzed, S4) map to
micro-batch Structured Streaming over a landing zone: ``readStream`` on
the pages directory (on a real deployment,
``spark.readStream.format("iceberg")`` over table snapshots), with
``foreachBatch`` driving the same ``incremental_update`` used by batch —
one code path for both arrival modes, checkpointed by the streaming
engine on top of the build's own per-group checkpoints.

Late/duplicate data needs no watermark: a re-delivered page dedups
against the (url, content-hash) state exactly like a re-crawl.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from myaku_spark.plans.incremental import incremental_update
from myaku_spark.sources.pages import PAGES_SCHEMA


def stream_pages_to_index(
    spark: SparkSession,
    landing_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    now: str,
    lexicon: set | None = None,
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) the indexing stream.

    Returns the StreamingQuery. Each micro-batch runs the exact batch
    incremental path; empty/unchanged batches are no-ops."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(landing_dir)
    )

    def process(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        incremental_update(spark, index_dir, batch_df, now=now, lexicon=lexicon)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
