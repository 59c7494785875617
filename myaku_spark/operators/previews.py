"""Search-result preview building (K4/P12/P13 parity).

The reference renders result previews by extracting the sentence around
a matched position (article_preview.py:126-231), collapsing whitespace
runs to an ideographic space (article_preview.py:26-34), and ranking
candidate sentences by a quality-bucketed length sort
(article_preview.py:37-62,142-160). Here: join top-k results to the
docs' text, then one pandas UDF slices the sentence around the first
matched position (textfns.find_sentence_start/end — the reference's own
segmentation, unit-tested against its edge cases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myaku_spark.functions.textfns import (
    collapse_whitespace_col,
    sentence_at_udf,
)


def attach_previews(
    hydrated: DataFrame,
    texts: DataFrame,
    first_pos_col: str = "first_start",
    text_col: str = "text",
) -> DataFrame:
    """results (doc_id, ..., first_start) ⋈ texts (doc_id, text) →
    + preview column: the whitespace-collapsed sentence containing the
    first matched position."""
    joined = hydrated.join(texts.select("doc_id", text_col), "doc_id", "left")
    sent = sentence_at_udf(F.col(text_col), F.col(first_pos_col))
    return joined.withColumn(
        "preview", collapse_whitespace_col(sent)
    ).drop(text_col)


def preview_for_results(
    spark,
    index_dir: str,
    results: list[tuple[float, int]],
    terms: list[str],
    pages: DataFrame,
) -> DataFrame:
    """Full preview pipeline for a search result list: recover the first
    matched position of any query term per doc from the segments, then
    slice the sentence. ``pages`` supplies (url, text)."""
    from myaku_spark.operators.codec import decode_block
    from myaku_spark.operators.segments import read_term_segments

    if not results:
        return spark.createDataFrame(
            [], "doc_id long, score double, preview string"
        )
    doc_ids = {int(d) for _, d in results}
    # Two-phase read: block metadata first, then blobs for ONLY the
    # blocks whose doc range intersects the (≤ k·pages) result set —
    # never the whole posting list of a head term.
    import bisect

    sorted_ids = sorted(doc_ids)

    def _hits(lo: int, hi: int) -> bool:
        i = bisect.bisect_left(sorted_ids, lo)
        return i < len(sorted_ids) and sorted_ids[i] <= hi

    from myaku_spark.plans import catalog

    seg = read_term_segments(
        spark, catalog.path_of(index_dir, "segments"), terms
    )
    meta = seg.select("term", "block_id", "min_doc", "max_doc").collect()
    need_by_term: dict[str, set] = {}
    for m in meta:
        if _hits(int(m.min_doc), int(m.max_doc)):
            need_by_term.setdefault(m.term, set()).add(int(m.block_id))
    cond = None
    for t, ids in need_by_term.items():
        c = (F.col("term") == t) & F.col("block_id").isin(list(ids))
        cond = c if cond is None else (cond | c)
    rows = seg.filter(cond).collect() if cond is not None else []
    first_pos: dict[int, int] = {}
    for r in rows:
        dec = decode_block(bytes(r.blob))
        pos = dec.get("positions")
        for i, d in enumerate(dec["doc_ids"]):
            d = int(d)
            if d in doc_ids and pos is not None and pos[i]:
                p = pos[i][0][0]
                if d not in first_pos or p < first_pos[d]:
                    first_pos[d] = p
    rdf = spark.createDataFrame(
        [
            (int(d), float(s), int(first_pos.get(int(d), 0)))
            for s, d in results
        ],
        ["doc_id", "score", "first_start"],
    )
    docs = spark.read.parquet(catalog.path_of(index_dir, "docs")).select(
        "doc_id", "url"
    )
    texts = docs.join(pages.select("url", "text"), "url").select(
        "doc_id", "text"
    )
    return attach_previews(rdf.join(docs, "doc_id"), texts)
