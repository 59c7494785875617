"""spark-submit entry point for the index build.

Cluster:
    zip -r myaku_spark.zip myaku_spark
    spark-submit --py-files myaku_spark.zip scripts/run_build.py \
        --pages <pages parquet/iceberg path> --out <index dir> \
        --n-groups 256 --now "2026-08-01 00:00:00"

Sandbox/bench (synthesized pages):
    python scripts/run_build.py --synth 2000 --out /tmp/idx --bench

Prints one JSON line with build metrics (docs, wall seconds, docs/sec).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages table path (parquet)")
    ap.add_argument(
        "--warc", help="WARC shard dir/file (Common Crawl landing) instead"
    )
    ap.add_argument(
        "--stream-warc",
        action="store_true",
        help="with --warc DIR: run the continuous-ingestion path "
             "instead of one batch build — drain the dir through the "
             "binaryFile stream (bootstrap build on the first batch, "
             "incremental_update after; checkpointed in <out>/_stream_ckpt "
             "so re-runs only index newly landed shards)",
    )
    ap.add_argument("--synth", type=int, help="synthesize N pages instead")
    ap.add_argument("--out", help="index output dir (temp when omitted)")
    ap.add_argument("--n-groups", type=int, default=2)
    ap.add_argument("--now", default="2026-08-01 00:00:00")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument(
        "--bench", action="store_true", help="remove the index afterwards"
    )
    ap.add_argument(
        "--paras",
        default="2,6",
        help="synth page paragraph range lo,hi (10,30 ≈ real web pages)",
    )
    args = ap.parse_args()

    from myaku_spark.plans.build_index import build_index
    from myaku_spark.session import get_spark
    from myaku_spark.sources.pages import read_pages, synth_pages_df

    spark = get_spark("myaku_spark_build", parallelism=args.cpus)
    cpus = spark.sparkContext.defaultParallelism
    out = args.out or tempfile.mkdtemp(prefix="myaku_idx_")

    if args.stream_warc:
        if not args.warc:
            ap.error("--stream-warc requires --warc DIR")
        from myaku_spark.streaming.warc_stream import stream_warc_to_index

        t0 = time.time()
        q = stream_warc_to_index(
            spark, args.warc, out, os.path.join(out, "_stream_ckpt"),
            now=args.now, bootstrap_n_groups=args.n_groups,
        )
        q.awaitTermination()
        wall = time.time() - t0
        # zero-new-shards drains are routine for a re-runnable stream:
        # the index may not exist yet (nothing ever landed) — report 0
        from myaku_spark.plans import catalog

        n_docs = (
            spark.read.parquet(f"{out}/docs").count()
            if catalog.parquet_exists(f"{out}/docs")
            else 0
        )
        print(
            json.dumps(
                {
                    "mode": "stream_warc",
                    "docs_in_index": n_docs,
                    "wall_sec": round(wall, 3),
                    "out": out,
                    "cpus": cpus,
                }
            )
        )
        spark.stop()
        return

    if args.synth:
        lo, hi = (int(x) for x in args.paras.split(","))
        pages = synth_pages_df(
            spark, args.synth, partitions=max(cpus, 8) * 2, paras=(lo, hi)
        )
    elif args.warc:
        from myaku_spark.sources.warc import read_warc, warc_to_pages

        pages = warc_to_pages(read_warc(spark, args.warc))
    else:
        pages = read_pages(spark, args.pages)

    # Materialize inputs once so the timed section measures the build,
    # not page synthesis/scan differences.
    pages = pages.persist()
    n_pages = pages.count()

    t0 = time.time()
    metrics = build_index(
        spark, pages, out, n_groups=args.n_groups, now=args.now
    )
    wall = time.time() - t0
    docs = sum(m["docs"] for m in metrics)
    print(
        json.dumps(
            {
                "n_pages": n_pages,
                "docs_indexed": docs,
                "groups": len(metrics),
                "terms": sum(m["terms"] for m in metrics),
                "postings": sum(m["postings"] for m in metrics),
                "index_bytes": sum(m["bytes"] for m in metrics),
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(docs / wall, 2) if wall > 0 else 0,
                "cpus": cpus,
            }
        )
    )
    if args.bench and not args.out:
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
