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


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-token-window chunking with overlap — the standard
    pre-tokenization step that turns long documents into
    training/embedding-sized pieces while the ``overlap`` preserves
    context across cut points. Chunk k covers token indices
    [k·step, k·step + max_tokens) with step = max_tokens − overlap;
    the chunk TEXT is the original character span from the first
    token's start to the last token's end (original spacing survives —
    chunks re-tokenize to exactly their token slice). Emits
    (id, chunk_id, n_tokens, chunk_text); a doc at or under the budget
    is one chunk; empty/NULL text emits nothing.

    Token offsets come from a posexplode + doc-keyed cumulative-length
    window — the SAME relational recipe as the oracle's toks CTE, and
    LINEAR per document (an aggregate()/array_append fold would copy
    the accumulator per token: O(tokens²) per doc, fatal for exactly
    the long documents chunking exists for). One shuffle keyed by
    doc_id (window + the offsets groupBy share the partitioning); the
    window hot key is one document's tokens, never corpus-wide."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if overlap >= max_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < max_tokens ({max_tokens})"
        )
    step = max_tokens - overlap
    raw = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__t"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("ord", "w"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # offsets count empty tokens' separators (the shared invariant with
    # tokenize_whitespace_col and the oracle's toks CTE); empties are
    # dropped AFTER the offset accounting
    offs = raw.withColumn(
        "s",
        F.coalesce(
            F.sum(F.length("w") + 1).over(win), F.lit(0)
        ).cast("int"),
    ).filter(F.length("w") > 0)
    base = (
        offs.groupBy("doc_id")
        .agg(
            F.max("__t").alias("__t"),  # constant per doc
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("s"),
                        (F.col("s") + F.length("w"))
                        .cast("int")
                        .alias("e"),
                    )
                )
            ).alias("ts"),
        )
        .filter(F.size("ts") > 0)
    )
    n = F.size("ts")
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(overlap)) / F.lit(step)).cast("int")
    )
    out = base.select(
        "doc_id", "__t", "ts",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    lo = F.col("chunk_id") * step  # 0-based first token index
    hi = F.least(lo + max_tokens, F.size("ts"))  # exclusive end
    first = F.element_at("ts", lo.cast("int") + 1)
    last = F.element_at("ts", hi.cast("int"))
    return out.select(
        F.col("doc_id").alias(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        (hi - lo).cast("int").alias("n_tokens"),
        F.substring(
            F.col("__t"), first["s"] + 1, last["e"] - first["s"]
        ).alias("chunk_text"),
    )
