"""Measure the batched-WAND conjunctive block prefilter's crossover.

The prefilter prunes non-rare terms' blocks to the rare term's block
ranges BEFORE the candidate-blob shuffle. Its win condition is real but
specific: the rare term's ranges must be NARROW relative to the head
term's block span. Doc ids are the global (warc_ts, url) rank, so at
web scale rare terms ARE temporally clustered (a neologism or event
term lives in a few crawl windows); in the driver's synthetic corpora,
by contrast, rare terms scatter uniformly, every tail block spans the
whole doc range, nothing prunes, and the prefilter is pure fixed cost —
which is exactly why `prefilter_and="auto"` keeps it off below the
footprint threshold.

This script constructs the honest win case at sandbox scale: one head
term across all docs (heavy position payloads), eight marker terms
each clustered in one narrow doc range, 128 conjunctive (head, marker)
queries. It times batch_search with the prefilter forced on vs off,
asserts identical results, and writes PREFILTER_CROSSOVER.json.

Run exclusively (no other Spark JVMs):
    python scripts/prefilter_crossover.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from myaku_spark.operators.batch_search import batch_search  # noqa: E402
from myaku_spark.operators.segments import (  # noqa: E402
    build_segments,
    write_segments,
)
from myaku_spark.session import get_spark  # noqa: E402

N_MARKERS = 8
MARKER_DF = 256
POS_PER_DOC = 24  # heavy position payload: what makes the blob shuffle real


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("prefilter_crossover", parallelism=32)

    # Head term in every doc, POS_PER_DOC fake positions each.
    head = spark.range(n_docs).select(
        F.lit("h0").alias("term"),
        F.col("id").alias("doc_id"),
        F.lit(POS_PER_DOC).cast("int").alias("tf"),
        # hash-derived irregular gaps: realistic varint widths, does NOT
        # collapse under the codec's zlib layer (regular strides would
        # compress to nothing and fake away the blob shuffle)
        F.expr(
            f"""aggregate(
              sequence(0, {POS_PER_DOC - 1}),
              named_struct('acc', 0, 'out',
                CAST(array() AS array<struct<start:int,len:int>>)),
              (s, i) -> named_struct(
                'acc', s.acc + 5 + CAST(pmod(xxhash64(id, i), 120) AS INT),
                'out', concat(s.out, array(named_struct(
                  'start', s.acc, 'len', 3)))),
              s -> s.out)"""
        ).alias("positions"),
        F.lit(100).alias("score"),
    )
    # Markers m0..m7: each clustered in ONE narrow doc range — the
    # temporally-local rare term (doc ids are the warc_ts rank).
    stride = n_docs // N_MARKERS
    markers = (
        spark.range(N_MARKERS * MARKER_DF)
        .select(
            F.concat(
                F.lit("m"), (F.col("id") / MARKER_DF).cast("int")
            ).alias("term"),
            (
                (F.col("id") / MARKER_DF).cast("int") * stride
                + F.col("id") % MARKER_DF
            ).alias("doc_id"),
            F.lit(1).cast("int").alias("tf"),
            F.expr(
                "array(named_struct('start', CAST(0 AS INT),"
                " 'len', CAST(3 AS INT)))"
            ).alias("positions"),
            F.lit(100).alias("score"),
        )
    )
    d = tempfile.mkdtemp(prefix="prefilter_xover_")
    try:
        segs = build_segments(
            head.unionByName(markers), payload_col="score"
        )
        # group=0 partition dir: the delta-group column the index layout
        # carries (build_index writes one dir per group)
        write_segments(segs, os.path.join(d, "segments", "group=0"))
        meta = spark.read.parquet(os.path.join(d, "segments"))
        n_blocks = meta.filter(F.col("term") == "h0").count()
        seg_bytes = meta.agg(
            F.sum(F.length("blob")).alias("b")
        ).collect()[0].b

        queries = [
            (f"q{i}", ["h0", f"m{i % N_MARKERS}"]) for i in range(128)
        ]
        results = {}
        timings = {}
        for label, pf in (("prefilter_on", True), ("prefilter_off", False)):
            t0 = time.time()
            rows = batch_search(
                spark, d, queries, k=10, combine="and", prefilter_and=pf
            ).collect()
            timings[label] = round(time.time() - t0, 3)
            results[label] = sorted(
                (r.query_id, r.rank, r.doc_id, round(r.score, 6))
                for r in rows
            )
        assert results["prefilter_on"] == results["prefilter_off"], (
            "prefilter changed results"
        )
        out = {
            "n_docs": n_docs,
            "head_blocks": n_blocks,
            "segment_bytes": seg_bytes,
            "n_queries": len(queries),
            "marker_df": MARKER_DF,
            "sec_prefilter_on": timings["prefilter_on"],
            "sec_prefilter_off": timings["prefilter_off"],
            "speedup_off_over_on": round(
                timings["prefilter_off"] / timings["prefilter_on"], 2
            ),
            "result_rows": len(results["prefilter_on"]),
            "note": (
                "clustered rare terms (the time-ordered-doc-id case); "
                "results identical both paths"
            ),
        }
        print(json.dumps(out))
        with open(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "PREFILTER_CROSSOVER.json",
            ),
            "w",
        ) as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
