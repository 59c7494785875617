"""Custom stateful streaming operator: cross-batch exact dedup via
``applyInPandasWithState``.

The batch twin is first-writer-wins content dedup (P9/J4,
plans/build_index.extract_and_dedupe); this operator extends it to a
STREAM: a document passes through only if its content hash has never
been seen in any earlier micro-batch — the dedup gate a training-data
ingest pipeline runs in front of tokenization. Group state (keyed by
text_hash) stores the first-seen doc, so re-deliveries and cross-batch
duplicates drop without any external store.

At scale the state store is hash-partitioned by text_hash (the groupBy
key): per-key state is one row, lookups never leave the partition, and
each micro-batch shuffles only its own documents — the standard
Structured Streaming stateful layout. State growth is one row per
distinct document; a production deployment bounds it with
GroupStateTimeout (processing-time TTL) exactly like the reference
bounds its Redis cache (cache.py:327) — kept NoTimeout here so the
dedup guarantee is absolute for the test corpus.
"""

from __future__ import annotations

import pandas as pd

OUTPUT_SCHEMA = "text_hash string, doc_id long, first_seen_batch boolean"
STATE_SCHEMA = "seen_doc_id long"


def _dedup_group(key, pdf_iter, state):
    """Per-hash handler: emit the first-ever occurrence, swallow the
    rest (within-batch duplicates pick the smallest doc_id — the same
    first-writer-wins tie-break as the batch path)."""
    (text_hash,) = key
    batches = list(pdf_iter)
    if not batches:
        return
    if state.exists:
        return  # hash already emitted in an earlier batch
    pdf = pd.concat(batches, ignore_index=True)
    keeper = int(pdf["doc_id"].min())
    state.update((keeper,))
    yield pd.DataFrame(
        {
            "text_hash": [text_hash],
            "doc_id": [keeper],
            "first_seen_batch": [True],
        }
    )


def dedup_stream(docs_stream):
    """docs stream (doc_id, text_hash, ...) → one row per NEW content
    hash (append mode); duplicates within and across micro-batches are
    dropped from group state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return docs_stream.groupBy("text_hash").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
