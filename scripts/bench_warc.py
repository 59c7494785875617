"""WARC ingestion at realistic shard size (r5 verdict #6).

The WARC pytest shards are KB-scale; this script measures what a
Common-Crawl-sized deployment cares about, in two parts:

1. **Per-task parse profile** — synthesize ONE .warc.gz shard of a few
   hundred MB (member-per-record gzip, synthetic HTML pages), then run
   the streaming parser on it in a fresh subprocess exactly as one
   Spark task would (the binaryFile source hands a task the compressed
   bytes; the task streams the decompression), reporting throughput
   and the subprocess RSS high-water mark — which must stay near the
   compressed size, far below compressed + inflated (the
   sources/warc.py claim: the inflated shard never materializes).

2. **Multi-shard e2e smoke** — read_warc → warc_to_pages →
   build_index over a directory of shards on local[N], reporting
   docs/s so archive-path ingestion has a measured throughput row.

3. **Archive-scan scaling** (``--scan-scaling-base N``) — the same
   shard directory parsed end-to-end at local[N] vs local[4N], fresh
   sequential JVMs, reporting the two-parallelism efficiency.

Usage:
    python scripts/bench_warc.py [--shard-mb 200] [--e2e-pages 2000]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _html_bytes(h) -> bytes:
    return h if isinstance(h, (bytes, bytearray)) else h.encode("utf-8")


def synth_shard(path: str, target_mb: int) -> dict:
    """Write one member-per-record .warc.gz of ~target_mb compressed,
    streaming record by record (generator memory stays flat no matter
    the shard size). Returns size metadata."""
    from myaku_spark.sources.pages import synth_page
    from myaku_spark.sources.warc import warc_record_bytes

    target = target_mb << 20
    raw_bytes = 0
    n = 0
    with open(path, "wb") as f:
        written = 0
        while written < target:
            p = synth_page(n)
            rec = warc_record_bytes(
                p["url"],
                "2026-01-01T00:00:00Z",
                _html_bytes(p["html"]),
            )
            raw_bytes += len(rec)
            gz = gzip.compress(rec, compresslevel=6)
            f.write(gz)
            written += len(gz)
            n += 1
    return {
        "records": n,
        "compressed_mb": round(written / 1e6, 1),
        "inflated_mb": round(raw_bytes / 1e6, 1),
    }


def profile_parse(path: str) -> dict:
    """One task's work, measured in a FRESH subprocess: read the
    compressed blob (as binaryFile holds it), stream-parse draining the
    record iterator, report wall time + RSS high-water mark. The
    subprocess must spawn from a small parent — ru_maxrss survives
    fork+exec, so a large parent image would be inherited into the
    child's reading (observed: a 600 MB parent made a 250 MB task read
    663 MB). Peak RSS must sit near the compressed size, far below
    compressed + inflated, or the 'inflated shard never materializes'
    claim (sources/warc.py) is false. tracemalloc is avoided: its
    allocator hooks slow this alloc-heavy loop ~20x."""
    import subprocess

    code = (
        "import json, resource, sys, time\n"
        "sys.path.insert(0, %r)\n"
        "from myaku_spark.sources.warc import iter_warc_records\n"
        "data = open(%r, 'rb').read()\n"
        "n = 0\n"
        "inflated = 0\n"
        "t0 = time.time()\n"
        "for rec in iter_warc_records(%r, data):\n"
        "    n += 1\n"
        "    inflated += len(rec[6] or b'')\n"
        "wall = time.time() - t0\n"
        "rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss\n"
        "print(json.dumps({'rows': n, 'wall': wall,\n"
        "  'inflated': inflated, 'compressed': len(data),\n"
        "  'rss_kib': rss}))\n"
    ) % (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        path,
        path,
    )
    m = json.loads(
        subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            check=True,
            timeout=1800,
        ).stdout.strip().splitlines()[-1]
    )
    wall = m["wall"]
    return {
        "rows": m["rows"],
        "parse_sec": round(wall, 2),
        "inflated_mb_per_sec": round(m["inflated"] / 1e6 / wall, 1),
        "compressed_mb_per_sec": round(m["compressed"] / 1e6 / wall, 1),
        "compressed_mb": round(m["compressed"] / 1e6, 1),
        "inflated_mb": round(m["inflated"] / 1e6, 1),
        # whole-subprocess high-water mark: interpreter + the held
        # compressed blob + the streaming parse (rows drained, not kept)
        "task_peak_rss_mb": round(m["rss_kib"] / 1024.0, 1),
    }


def e2e_smoke(tmp: str, n_pages: int, cpus: int) -> dict:
    """Multi-shard directory → read_warc → pages → full index build."""
    from myaku_spark.plans.build_index import build_index
    from myaku_spark.session import get_spark
    from myaku_spark.sources.pages import synth_page
    from myaku_spark.sources.warc import (
        read_warc,
        warc_record_bytes,
        warc_to_pages,
    )

    d = os.path.join(tmp, "shards")
    os.makedirs(d, exist_ok=True)
    n_shards = 8
    per = n_pages // n_shards
    for s in range(n_shards):
        with open(os.path.join(d, f"cc-{s:05d}.warc.gz"), "wb") as f:
            for i in range(s * per, (s + 1) * per):
                p = synth_page(i)
                f.write(
                    gzip.compress(
                        warc_record_bytes(
                            p["url"],
                            "2026-01-01T00:00:00Z",
                            _html_bytes(p["html"]),
                        )
                    )
                )
    import shutil

    spark = get_spark("bench_warc", parallelism=cpus)
    idx = os.path.join(tmp, "idx")
    shutil.rmtree(idx, ignore_errors=True)  # build is resumable: a
    # leftover completed index would short-circuit to 0 docs
    t0 = time.time()
    pages = warc_to_pages(read_warc(spark, d))
    m = build_index(spark, pages, idx, n_groups=1)
    wall = time.time() - t0
    docs = sum(r["docs"] for r in m)
    spark.stop()
    return {
        "shards": n_shards,
        "pages": docs,
        "warc_to_index_sec": round(wall, 2),
        "docs_per_sec": round(docs / wall, 1),
    }


def scan_scaling(tmp: str, base_cpus: int) -> dict:
    """Archive-scan scaling at N vs 4N cores (the north rule's
    two-parallelism criterion, on the ingestion surface): the same
    multi-shard directory parses via read_warc().count() in a fresh
    JVM per leg (one whole-shard task per file — with >= 4N shards
    both legs saturate). Sequential, never two JVMs at once."""
    import subprocess

    # enough shards to keep 4N cores busy for multiple waves, and
    # enough bytes per shard that parse work dwarfs fixed job overhead
    n_shards = base_cpus * 8
    # dir keyed by shard count: a stale dir from a different base would
    # otherwise silently change the measured workload (and regenerating
    # from scratch wastes the overlap)
    d = os.path.join(tmp, f"scale_shards_{n_shards}")
    if not os.path.isdir(d) or len(os.listdir(d)) != n_shards:
        os.makedirs(d, exist_ok=True)
        from myaku_spark.sources.pages import synth_page
        from myaku_spark.sources.warc import warc_record_bytes

        per = 4000
        for s in range(n_shards):
            with open(
                os.path.join(d, f"sc-{s:05d}.warc.gz"), "wb"
            ) as f:
                for i in range(s * per, (s + 1) * per):
                    p = synth_page(i)
                    f.write(
                        gzip.compress(
                            warc_record_bytes(
                                p["url"],
                                "2026-01-01T00:00:00Z",
                                _html_bytes(p["html"]),
                            )
                        )
                    )

    def leg(cpus: int) -> dict:
        code = (
            "import json, sys, time\n"
            "sys.path.insert(0, %r)\n"
            "from myaku_spark.session import get_spark\n"
            "from myaku_spark.sources.warc import read_warc\n"
            "spark = get_spark('warc_scan', parallelism=%d)\n"
            "read_warc(spark, %r).count()  # warm (JVM/codegen)\n"
            "t0 = time.time()\n"
            "n = read_warc(spark, %r).count()\n"
            "print(json.dumps({'rows': n, 'wall': time.time() - t0}))\n"
            "spark.stop()\n"
        ) % (
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            cpus, d, d,
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, check=True, timeout=1800,
        ).stdout.strip().splitlines()[-1]
        return json.loads(out)

    lo = leg(base_cpus)
    hi = leg(base_cpus * 4)
    eff = (lo["wall"] / hi["wall"]) / 4.0
    return {
        "shards": len(os.listdir(d)),
        "records": lo["rows"],
        "n_cores": base_cpus,
        "four_n_cores": base_cpus * 4,
        "wall_n_sec": round(lo["wall"], 2),
        "wall_4n_sec": round(hi["wall"], 2),
        "scaling_efficiency": round(eff, 3),
        "meets_0_8": eff >= 0.8,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shard-mb", type=int, default=200)
    ap.add_argument("--e2e-pages", type=int, default=2000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--tmp", default="/tmp/bench_warc")
    ap.add_argument(
        "--scan-scaling-base", type=int, default=0,
        help="also run the archive-scan N-vs-4N scaling legs with this "
             "base core count (0 = skip)",
    )
    args = ap.parse_args()
    os.makedirs(args.tmp, exist_ok=True)
    shard = os.path.join(args.tmp, "big-00000.warc.gz")

    t0 = time.time()
    if (
        os.path.exists(shard)
        and os.path.getsize(shard) >= (args.shard_mb << 20)
    ):
        meta = {"records": None, "reused": True,
                "compressed_mb": round(os.path.getsize(shard) / 1e6, 1)}
    else:
        meta = synth_shard(shard, args.shard_mb)
    gen_sec = round(time.time() - t0, 1)
    prof = profile_parse(shard)
    scaling = (
        scan_scaling(args.tmp, args.scan_scaling_base)
        if args.scan_scaling_base
        else None
    )
    e2e = e2e_smoke(args.tmp, args.e2e_pages, args.cpus)
    print(
        json.dumps(
            {
                "metric": "warc_shard_bench",
                "shard": {**meta, "gen_sec": gen_sec},
                "parse": prof,
                "scan_scaling": scaling,
                "e2e": e2e,
            }
        )
    )


if __name__ == "__main__":
    main()
