"""Continuous archive ingestion: WARC shards land → incremental index.

The batch path (`run_build.py --warc`) indexes a fixed archive
directory; a live deployment receives Common Crawl-style shards
continuously (a crawler or a transfer job dropping `.warc.gz` files).
This maps that arrival mode onto Structured Streaming's file source in
``binaryFile`` format: each micro-batch is a set of whole shards (one
task per shard, the same unit of parallelism as batch), parsed by the
shared streaming-decompression kernel (``warc_records_df``), projected
onto the pages schema, and applied through the SAME
``incremental_update`` the batch and parquet-streaming paths use —
changed pages re-index, superseded docs tombstone, re-delivered shards
dedup against (url, content-hash) state. One code path for every
arrival mode; the streaming engine checkpoints which shards have been
consumed on top of the build's own per-group checkpoints, so a
restarted stream never re-indexes a processed shard.

No counterpart in the reference (cron-batch crawls only, SURVEY §2.9);
this is the archive-scale arrival surface of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from myaku_spark.plans.incremental import incremental_update
from myaku_spark.sources.warc import warc_records_df, warc_to_pages


def stream_warc_to_index(
    spark: SparkSession,
    warc_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    now: str,
    lexicon: set | None = None,
    pattern: str = "*.warc*",
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    bootstrap_n_groups: int = 1,
):
    """Start (and with available_now=True, drain) the shard stream.

    Returns the StreamingQuery. Each micro-batch holds at most
    ``max_files_per_trigger`` whole shards — at ~1 GB Common Crawl
    shard size that bounds a micro-batch's input, and the bounded-
    batch reader keeps per-task memory at compressed + one Arrow
    batch regardless of shard size.

    An EMPTY ``index_dir`` bootstraps: the first non-empty micro-batch
    runs a full ``build_index`` (``bootstrap_n_groups`` groups — delta
    groups are per-micro-batch afterwards, so the base group count
    only shapes the initial shard set), and every later batch takes
    the incremental path. ``incremental_update`` requires an existing
    index, so without this the first batch of a fresh deployment would
    fail on the missing build_meta."""
    stream = (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema; binaryFile's is
        # fixed by the format
        .schema(
            "path string, modificationTime timestamp,"
            " length long, content binary"
        )
        .option("pathGlobFilter", pattern)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(warc_dir)
    )

    def process(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        pages = warc_to_pages(warc_records_df(batch_df))
        from myaku_spark.plans import catalog

        if not catalog.parquet_exists(f"{index_dir}/build_meta"):
            from myaku_spark.plans.build_index import build_index

            build_index(
                spark, pages, index_dir,
                n_groups=bootstrap_n_groups, now=now, lexicon=lexicon,
            )
            return
        incremental_update(
            spark, index_dir, pages, now=now, lexicon=lexicon
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
