"""Measured ANN recall: every approximate index vs exact brute force.

"Measure, don't guess": the LSH / IVF / PQ operators each trade recall
for a bounded join, and their oracles prove plan correctness — this
script measures the RECALL side of the trade on the embeddings table,
sweeping each operator's dial (multiprobe depth, nprobe, PQ subspaces)
against exact cosine top-k ground truth. recall@k = |approx ∩ exact|/k
averaged over the query set.

Usage:
    python scripts/ann_recall.py [--sf-dir /root/testdata/sf0.01]
        [--k 10] [--n-queries 20] [--cpus 8]
Prints ONE JSON line (recorded as ANN_RECALL_r{N}.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=20)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from myaku_spark.operators.similarity import (
        ann_topk,
        cosine_topk,
        ivf_topk,
        pq_adc_topk,
    )
    from myaku_spark.session import get_spark

    spark = get_spark("ann_recall", parallelism=args.cpus)
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_vecs = emb.count()
    dim = len(emb.select("embedding").first().embedding)
    queries = (
        emb.filter(F.col("vec_id") < args.n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
        .persist()
    )
    emb = emb.persist()

    def ids_by_query(df) -> dict[int, set]:
        out: dict[int, set] = {}
        for r in df.collect():
            out.setdefault(int(r.q_id), set()).add(int(r.vec_id))
        return out

    exact = ids_by_query(cosine_topk(emb, queries, k=args.k))

    def recall(df) -> float:
        got = ids_by_query(df)
        per_q = [
            len(got.get(q, set()) & truth) / len(truth)
            for q, truth in exact.items()
        ]
        return round(sum(per_q) / len(per_q), 4)

    results: dict[str, float] = {}
    for probe in (0, 1, 2):
        results[f"lsh_8planes_multiprobe{probe}"] = recall(
            ann_topk(emb, queries, k=args.k, n_planes=8, multiprobe=probe)
        )
    for nprobe in (1, 2, 4, 8, 16):
        results[f"ivf_16lists_nprobe{nprobe}"] = recall(
            ivf_topk(
                emb, queries, k=args.k, n_centroids=16, nprobe=nprobe
            )
        )
    for m in (4, 8):
        results[f"pq_m{m}_k8_adc"] = recall(
            pq_adc_topk(emb, queries, k=args.k, m=m, k_cb=8, dim=dim)
        )

    print(
        json.dumps(
            {
                "metric": "ann_recall_at_k",
                "k": args.k,
                "n_queries": len(exact),
                "n_vectors": n_vecs,
                "dim": dim,
                "recall": results,
                "sf_dir": args.sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
