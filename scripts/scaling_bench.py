"""Two-parallelism scaling evidence (the north rule's N vs 4N criterion).

No real cluster exists in this sandbox, so the same index-build job runs
at local[N] and local[4N] (default 8 vs 32 cores) on the SAME
synthesized input, each in a fresh JVM via subprocess; reports
throughput at both levels plus scaling efficiency
    eff = throughput(4N) / (4 * throughput(N))
and writes BENCH_SCALING.json.

Usage: python scripts/scaling_bench.py [--n-pages 4000] [--base-cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_build(n_pages: int, cpus: int, n_groups: int, paras: str) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "scripts/run_build.py"),
        "--synth",
        str(n_pages),
        "--n-groups",
        str(n_groups),
        "--cpus",
        str(cpus),
        "--paras",
        paras,
        "--bench",
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=1800
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"no JSON from build: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=150000)
    ap.add_argument("--base-cpus", type=int, default=8)
    ap.add_argument("--n-groups", type=int, default=1)
    ap.add_argument(
        "--paras",
        default="10,30",
        help="synth paragraph range; 10,30 ≈ 2-3KB/page (CC-like)",
    )
    args = ap.parse_args()

    lo = run_build(args.n_pages, args.base_cpus, args.n_groups, args.paras)
    hi = run_build(args.n_pages, args.base_cpus * 4, args.n_groups, args.paras)
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    result = {
        "n_pages": args.n_pages,
        "paras": args.paras,
        "base_cpus": args.base_cpus,
        "throughput_n": lo["docs_per_sec"],
        "throughput_4n": hi["docs_per_sec"],
        "wall_n_sec": lo["wall_sec"],
        "wall_4n_sec": hi["wall_sec"],
        "scaling_efficiency": round(eff, 3),
        "meets_0_8": eff >= 0.8,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
