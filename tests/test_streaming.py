"""Structured Streaming incremental indexing over a landing directory."""

import pytest
from pyspark.sql import functions as F

from myaku_spark.operators.search import IndexSearcher
from myaku_spark.plans.build_index import build_index
from myaku_spark.sources.pages import synth_pages_df
from myaku_spark.streaming.pages_stream import stream_pages_to_index

NOW = "2026-08-01 00:00:00"


def test_stream_drains_landing_zone_into_index(spark, tmp_path):
    landing = str(tmp_path / "landing")
    idx = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")

    # Base index from the first 30 pages.
    base = synth_pages_df(spark, 30, partitions=2)
    build_index(spark, base, idx, n_groups=1, now=NOW)
    n0 = spark.read.parquet(f"{idx}/docs").count()

    # Land two file batches: 10 re-delivered (unchanged) + 15 new pages.
    base.limit(10).write.mode("append").parquet(landing)
    import pandas as pd  # noqa: F401

    new_pages = (
        synth_pages_df(spark, 45, partitions=2)
        .filter(F.col("url").isin(
            [r.url for r in synth_pages_df(spark, 45, partitions=2)
             .select("url").subtract(base.select("url")).collect()]
        ))
    )
    new_pages.write.mode("append").parquet(landing)

    q = stream_pages_to_index(spark, landing, idx, ckpt, now=NOW)
    q.awaitTermination(240)

    docs = spark.read.parquet(f"{idx}/docs")
    n1 = docs.count()
    assert n1 == n0 + 15  # unchanged re-deliveries deduped, new indexed
    # New docs are searchable.
    s = IndexSearcher(spark, idx)
    term = (
        spark.read.parquet(f"{idx}/term_stats")
        .groupBy("term").agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df")).limit(1).collect()[0].term
    )
    hits = s.search([term], k=50)
    assert len(hits) > 0

    # Restarting the drained stream is a no-op (checkpointed).
    q2 = stream_pages_to_index(spark, landing, idx, ckpt, now=NOW)
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{idx}/docs").count() == n1
