"""spark-submit entry point for the training-data curation funnel.

Cluster:
    spark-submit --py-files myaku_spark.zip scripts/run_curate.py \
        --docs <documents parquet path> --out <curated dir> \
        --lang en --min-chars 180 --ppl-max 30.2

Sandbox:
    python scripts/run_curate.py --docs /root/testdata/sf0.01/documents.parquet \
        --out /tmp/curated

Writes the curated corpus to <out>/docs and the survivor funnel to
<out>/funnel (both parquet), and prints one JSON line with the
per-stage counts + wall seconds. The fitted LM is released after the
funnel materializes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True, help="output dir")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-chars", type=int, default=180)
    ap.add_argument("--ppl-max", type=float, default=30.2)
    ap.add_argument("--bp-min-docs", type=int, default=5)
    ap.add_argument("--bp-max-ratio", type=float, default=0.1)
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--salt", default="cur0")
    ap.add_argument(
        "--strip-common-lines", type=int, default=0, metavar="MIN_DOCS",
        help="pre-funnel line-level dedup (RefinedWeb line filter): "
             "excise lines appearing in >= MIN_DOCS distinct docs "
             "before any quality stage runs; 0 (default) = off",
    )
    ap.add_argument(
        "--strip-common-paragraphs", type=int, default=0,
        metavar="MIN_DOCS",
        help="pre-funnel paragraph-level dedup (CCNet granularity, "
             "normalized keys): excise paragraphs whose normalized "
             "form appears in >= MIN_DOCS distinct docs; 0 = off",
    )
    ap.add_argument(
        "--out-format", default="parquet",
        choices=["parquet", "jsonl", "wet"],
        help="jsonl = one JSON doc per line (the standard training-data "
             "delivery format; Spark's json sink is line-delimited); "
             "wet = WARC conversion records, gzip member-per-record "
             "(the Common Crawl extracted-text delivery shape)",
    )
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from myaku_spark.operators.lm import train_bigram_lm
    from myaku_spark.plans.curate import curate, curate_flags, curate_metrics
    from myaku_spark.session import get_spark

    spark = get_spark("run_curate", parallelism=args.cpus)
    t0 = time.time()
    docs = spark.read.parquet(args.docs)
    lines_removed = None
    paragraphs_removed = None

    def _ride_back(cleaned):
        # cleaned text rides back onto the full row (other columns —
        # source etc. — feed later funnel stages). LEFT join: docs with
        # NULL text have no cleaned row (nothing to posexplode) and
        # must still flow through the quality funnel — which drops
        # them visibly at its own stage — not vanish here.
        return (
            docs.withColumnRenamed("text", "_orig_text")
            .join(cleaned.select("doc_id", "text"), "doc_id", "left")
            .withColumn("text", F.coalesce("text", "_orig_text"))
            .drop("_orig_text")
        )

    if args.strip_common_paragraphs > 0:
        from myaku_spark.operators.dedup import strip_common_paragraphs

        pcleaned = strip_common_paragraphs(
            docs, min_docs=args.strip_common_paragraphs
        ).persist()
        paragraphs_removed = pcleaned.agg(
            F.sum("n_removed").cast("long").alias("n")
        ).collect()[0].n
        docs = _ride_back(pcleaned)
    if args.strip_common_lines > 0:
        from myaku_spark.operators.dedup import strip_common_lines

        cleaned = strip_common_lines(
            docs, min_docs=args.strip_common_lines
        ).persist()
        lines_removed = cleaned.agg(
            F.sum("n_removed").cast("long").alias("n")
        ).collect()[0].n
        docs = _ride_back(cleaned)
    lm = train_bigram_lm(docs)
    flags = curate_flags(
        docs,
        lang=args.lang,
        min_chars=args.min_chars,
        bp_min_docs=args.bp_min_docs,
        bp_max_ratio=args.bp_max_ratio,
        ppl_max=args.ppl_max,
        default_rate=args.default_rate,
        salt=args.salt,
        lm=lm,
    ).persist()
    curated = curate(docs, flags=flags)
    docs_out = os.path.join(args.out, "docs")
    wet_shards = None
    if args.out_format == "jsonl":
        curated.write.mode("overwrite").json(docs_out)
    elif args.out_format == "wet":
        from myaku_spark.sources.warc import write_wet

        # documents carry no url column; conversion records land with
        # a blank target URI and the fixed deterministic timestamp
        wet_shards = write_wet(curated, docs_out, url_col=None).collect()
    else:
        curated.write.mode("overwrite").parquet(docs_out)
    funnel = curate_metrics(flags).collect()
    flags.unpersist()
    if args.strip_common_lines > 0:
        cleaned.unpersist()
    if args.strip_common_paragraphs > 0:
        pcleaned.unpersist()
    lm.release()
    spark.createDataFrame(
        funnel, "stage_idx int, stage string, n_docs long"
    ).write.mode("overwrite").parquet(os.path.join(args.out, "funnel"))
    print(
        json.dumps(
            {
                "stages": {r.stage: r.n_docs for r in funnel},
                "lines_removed": lines_removed,
                "paragraphs_removed": paragraphs_removed,
                "wet_shards": (
                    len(wet_shards) if wet_shards is not None else None
                ),
                "wet_records": (
                    sum(r.records for r in wet_shards)
                    if wet_shards is not None
                    else None
                ),
                "wall_sec": round(time.time() - t0, 3),
                "out": args.out,
            }
        )
    )


if __name__ == "__main__":
    main()
