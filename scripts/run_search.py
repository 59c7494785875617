"""spark-submit entry point for serving queries against a built index.

Cluster:
    zip -r myaku_spark.zip myaku_spark
    spark-submit --py-files myaku_spark.zip scripts/run_search.py \
        --index <index dir> --query "猫 犬" --combine and --k 10

Batch mode — one Spark job for the whole query file (distributed
batched WAND, operators/batch_search.py):
    spark-submit ... scripts/run_search.py --index <dir> \
        --query-file queries.txt --k 10
    # queries.txt: one query per line, terms whitespace-separated;
    # lines starting with "phrase:" run the positional phrase engine
    # (batch_phrase_search — also one constant-size plan for all).

Time travel: --at-version N reads a past catalog snapshot
(interactive mode). Prints one JSON line per query:
    {"query": "...", "results": [[score, doc_id], ...]}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", help="one interactive query (terms)")
    ap.add_argument("--query-file", help="batch: one query per line")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--combine", choices=["and", "or"], default="and")
    ap.add_argument("--at-version", type=int, default=None)
    ap.add_argument(
        "--phrase-gap", type=int, default=0,
        help="position gap between phrase terms (0 for Japanese text, "
             "1 for whitespace-separated corpora)",
    )
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()
    if not args.query and not args.query_file:
        ap.error("one of --query / --query-file is required")

    from myaku_spark.session import get_spark

    spark = get_spark("myaku_search", parallelism=args.cpus)

    if args.query:
        from myaku_spark.operators.search import IndexSearcher

        s = IndexSearcher(
            spark, args.index, mode="myaku", version=args.at_version
        )
        hits = s.search(
            args.query.split(), k=args.k, combine=args.combine
        )
        print(json.dumps({
            "query": args.query,
            "results": [[float(sc), int(d)] for sc, d in hits],
        }))
        return

    lines = [
        ln.strip()
        for ln in open(args.query_file, encoding="utf-8")
        if ln.strip()
    ]
    term_qs = [
        (f"q{i}", ln.split())
        for i, ln in enumerate(lines)
        if not ln.startswith("phrase:")
    ]
    from myaku_spark.functions.widthnorm import normalize_char_width

    # Phrase terms get the same P6 width normalization batch_search
    # applies to term queries (index terms are width-normalized).
    phrase_qs = [
        (
            f"p{i}",
            [normalize_char_width(t) for t in ln[len("phrase:"):].split()],
        )
        for i, ln in enumerate(lines)
        if ln.startswith("phrase:")
    ]
    out: dict[str, list] = {}
    if term_qs:
        from myaku_spark.operators.batch_search import batch_search

        rows = batch_search(
            spark, args.index, term_qs, k=args.k, combine=args.combine
        ).collect()
        for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
            out.setdefault(r.query_id, []).append(
                [float(r.score), int(r.doc_id)]
            )
    if phrase_qs:
        from myaku_spark.operators.phrase import batch_phrase_search

        rows = batch_phrase_search(
            spark, args.index, phrase_qs, k=args.k, gap=args.phrase_gap
        ).collect()
        for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
            out.setdefault(r.query_id, []).append(
                [float(r.phrase_tf), int(r.doc_id)]
            )
    for qid, ln in [(q, l) for q, _ in term_qs for l in [lines[int(q[1:])]]] + [
        (p_, lines[int(p_[1:])]) for p_, _ in phrase_qs
    ]:
        print(json.dumps({"query": ln, "results": out.get(qid, [])}))


if __name__ == "__main__":
    main()
