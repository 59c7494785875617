"""Sequence packing for LLM training: assemble documents into
fixed-token-budget training sequences.

Real pipelines pack per shard (a worker's slice of the corpus), not
globally — a global greedy pack is inherently serial and a 10^12-doc
corpus cannot flow through one packer. Here each shard packs
independently inside one applyInPandas group: the shard column is the
unit of parallelism, fill waste is bounded per shard, and adding shards
scales linearly. The packer itself is next-fit greedy over a chosen
order ("length" = longest-first, the usual waste-reducing heuristic;
"id" = stream order for curriculum-stable packing); a doc longer than
the budget occupies a sequence alone (truncation is the trainer's
call, not the packer's).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    order: str = "length",
) -> DataFrame:
    """(shard, doc_id, n_tokens) → + (seq_id, seq_fill): which training
    sequence each document lands in and the sequence's running fill when
    it was added. seq_id is shard-local; (shard, seq_id) is the global
    sequence key. Deterministic: ties break on doc_id."""
    if order not in ("length", "id"):
        raise ValueError(f"order must be 'length' or 'id', got {order!r}")
    schema = (
        f"{shard_col} long, {id_col} long, {len_col} long, "
        "seq_id long, seq_fill long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if order == "length":
            pdf = pdf.sort_values([len_col, id_col], ascending=[False, True])
        else:
            pdf = pdf.sort_values(id_col)
        seq_ids, fills = [], []
        cur, fill, first = 0, 0, True
        for n in pdf[len_col]:
            n = int(n)
            if first:
                first = False
                fill = n
            elif fill + n > max_tokens:
                cur += 1
                fill = n
            else:
                fill += n
            seq_ids.append(cur)
            fills.append(fill)
        out = pdf[[shard_col, id_col, len_col]].copy()
        out["seq_id"] = seq_ids
        out["seq_fill"] = fills
        return out

    return df.groupBy(shard_col).applyInPandas(pack, schema)
