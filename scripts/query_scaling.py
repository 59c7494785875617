"""Query-side two-parallelism scaling evidence (N vs 4N on the SAME
index): build a sizable index once on disk, then run the 128-query
distributed batched-WAND workload at local[N] and local[4N], each in a
fresh JVM, and report queries/sec at both plus scaling efficiency.

Complements scripts/scaling_bench.py (index-build throughput): the
north rule's cluster-size criterion applied to the query engine. Legs
are sequential and exclusive — never overlap with another Spark JVM.

Usage: python scripts/query_scaling.py [--n-pages 20000] [--base-cpus 1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LEG = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from myaku_spark.operators.batch_search import batch_search
from myaku_spark.session import get_spark

spark = get_spark("query_scaling_leg", parallelism={cpus})
idx = {idx!r}
rows = (
    spark.read.parquet(f"{{idx}}/term_stats")
    .groupBy("term").agg(F.sum("df").alias("df"))
    .orderBy(F.desc("df"), "term").limit(256).collect()
)
terms = [r.term for r in rows]
queries = []
for i in range(128):
    if i % 2 == 0:
        queries.append((f"q{{i}}", [terms[i % len(terms)]]))
    else:
        queries.append(
            (f"q{{i}}",
             [terms[i % len(terms)], terms[(i * 7 + 3) % len(terms)]])
        )
# warm the JVM/codegen on a single-query batch, then time the 128-batch
batch_search(spark, idx, queries[:1], k=10, combine="and").count()
t0 = time.time()
n = batch_search(spark, idx, queries, k=10, combine="and").count()
wall = time.time() - t0
print(json.dumps({{"cpus": {cpus}, "wall_sec": round(wall, 3),
                   "qps": round(128 / wall, 2), "result_rows": n}}))
"""


def run_leg(idx: str, cpus: int) -> dict:
    code = _LEG.format(repo=REPO, cpus=cpus, idx=idx)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"no JSON from leg: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=20000)
    ap.add_argument("--base-cpus", type=int, default=1)
    args = ap.parse_args()

    idx = tempfile.mkdtemp(prefix="qscale_idx_")
    try:
        build = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "scripts/run_build.py"),
                "--synth", str(args.n_pages), "--n-groups", "1",
                "--cpus", "32", "--paras", "10,30", "--out", idx,
            ],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
        )
        if build.returncode != 0:
            raise RuntimeError(f"build failed: {build.stderr[-2000:]}")
        lo = run_leg(idx, args.base_cpus)
        hi = run_leg(idx, args.base_cpus * 4)
        eff = round(hi["qps"] / (4 * lo["qps"]), 3)
        out = {
            "workload": "wand_batch_128q over a fixed on-disk index",
            "n_pages": args.n_pages,
            "n_cores": args.base_cpus,
            "four_n_cores": args.base_cpus * 4,
            "qps_n": lo["qps"],
            "qps_4n": hi["qps"],
            "wall_n_sec": lo["wall_sec"],
            "wall_4n_sec": hi["wall_sec"],
            "scaling_efficiency": eff,
            "meets_0_8": eff >= 0.8,
            "result_rows": hi["result_rows"],
        }
        print(json.dumps(out))
        with open(os.path.join(REPO, "QUERY_SCALING.json"), "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
