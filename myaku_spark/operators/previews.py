"""Search-result preview building (K4/P12/P13 parity).

The reference builds result previews by grouping every matched position
into its containing sentence (datatypes.py:274-304
group_text_positions_by_sentence), ranking the candidate sentences by a
quality-bucketed length key (article_preview.py:37-62: ideal 70-90 >
acceptable-short 50-69 > acceptable-long 91-100 > too-short > too-long;
longer wins within a bucket), picking the best as the main sample
(article_preview.py:142-160), and collapsing whitespace runs to an
ideographic space (article_preview.py:26-34). Here: the per-doc matched
positions come off the segment position streams, and one pandas UDF per
result row runs the grouping + quality argmax — driver ships only the
(≤ k·pages) result rows, never posting lists.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myaku_spark.functions.textfns import (
    collapse_whitespace_col,
    find_sentence_end,
    find_sentence_start,
    sentence_at_udf,
)

# article_preview.py:15-18
MIN_ACCEPTABLE_LEN = 50
MIN_IDEAL_LEN = 70
MAX_IDEAL_LEN = 90
MAX_ACCEPTABLE_LEN = 100


def preview_quality_key(sentence_len: int) -> tuple[int, int]:
    """_sentence_group_preview_quality_key parity
    (article_preview.py:37-62): (bucket, length), larger = better."""
    if MIN_IDEAL_LEN <= sentence_len <= MAX_IDEAL_LEN:
        return (2, sentence_len)
    if MIN_ACCEPTABLE_LEN <= sentence_len < MIN_IDEAL_LEN:
        return (1, sentence_len)
    if MAX_IDEAL_LEN < sentence_len <= MAX_ACCEPTABLE_LEN:
        return (0, sentence_len)
    if sentence_len < MIN_ACCEPTABLE_LEN:
        return (-1, sentence_len)
    return (-2, sentence_len)


def group_positions_by_sentence(
    text: str, positions: list[tuple[int, int]]
) -> list[tuple[tuple[int, int], list[tuple[int, int]]]]:
    """group_text_positions_by_sentence parity (datatypes.py:274-304):
    [(sentence (start, len), [match positions])], in sentence-start
    order (positions are scanned sorted by start; consecutive positions
    inside the same sentence reuse its extent)."""
    groups: dict[tuple[int, int], list] = {}
    end = -1
    start = 0
    for pos in sorted(positions):
        p_start, p_len = int(pos[0]), int(pos[1])
        if p_start > end:
            start = find_sentence_start(text, p_start)
            end = find_sentence_end(text, p_start + p_len)
        groups.setdefault((start, end - start + 1), []).append((p_start, p_len))
    return list(groups.items())


def build_sample_segments(
    text: str,
    sentence: tuple[int, int],
    found_positions: list[tuple[int, int]],
) -> list[tuple[bool, str]]:
    """_create_sample_segments parity (article_preview.py:235-270):
    split the sample sentence into alternating (is_query_match, text)
    runs, lstrip the first / rstrip the last segment, then collapse
    whitespace per segment — the isQueryMatch highlighting structure the
    reference API serves. (The >100-char trim / short-sentence expand
    strategies of article_preview.py:293-480 are not replicated: the
    quality ranking prefers ≤100-char sentences, so the main sample
    rarely triggers them.)"""
    s_start, s_len = sentence
    segments: list[list] = []
    last_end = s_start
    for p_start, p_len in sorted(found_positions):
        if last_end != p_start:
            seg = text[last_end:p_start]
            segments.append([False, seg])
            last_end += len(seg)
        segments.append([True, text[p_start : p_start + p_len]])
        last_end += p_len
    end_text = text[last_end : s_start + s_len]
    if end_text:
        segments.append([False, end_text])
    segments[0][1] = segments[0][1].lstrip()
    segments[-1][1] = segments[-1][1].rstrip()
    import re as _re

    return [
        (bool(m), _re.sub(r"\s+", "　", t)) for m, t in segments
    ]


def best_preview_sample(
    text: str, positions
) -> tuple[str, list[tuple[bool, str]]] | None:
    """(best sentence, its match/non-match segments) — the main sample."""
    if text is None or not positions:
        return None
    groups = group_positions_by_sentence(text, list(positions))
    best = max(
        range(len(groups)),
        key=lambda i: (preview_quality_key(groups[i][0][1]), -i),
    )
    sent, in_sent = groups[best]
    return (
        text[sent[0] : sent[0] + sent[1]],
        build_sample_segments(text, sent, in_sent),
    )


def best_preview_sentence(text: str, positions) -> str:
    """The main preview sample's sentence: quality-key argmax over all
    candidate sentences containing a match. Stable-reverse sort parity:
    among equal keys the EARLIEST sentence wins, exactly like the
    reference's list.sort(key=..., reverse=True) on start-ordered
    groups (article_preview.py:148-150)."""
    if text is None:
        return None
    if not positions:
        return ""
    groups = group_positions_by_sentence(text, list(positions))
    best = max(
        range(len(groups)),
        key=lambda i: (preview_quality_key(groups[i][0][1]), -i),
    )
    s_start, s_len = groups[best][0]
    return text[s_start : s_start + s_len]


def _best_sentence_udf():
    """UDF built lazily — pandas_udf return-type parsing needs an active
    session, so module import must stay session-free."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def best_sentence(
        text: pd.Series, starts: pd.Series, lens: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                best_preview_sentence(
                    t,
                    list(zip(s, ln)) if s is not None else [],
                )
                for t, s, ln in zip(text, starts, lens)
            ]
        )

    return best_sentence


def attach_previews(
    hydrated: DataFrame,
    texts: DataFrame,
    first_pos_col: str = "first_start",
    text_col: str = "text",
) -> DataFrame:
    """Single-position fallback: results (doc_id, ..., first_start) ⋈
    texts → + preview column (sentence at the position)."""
    joined = hydrated.join(texts.select("doc_id", text_col), "doc_id", "left")
    sent = sentence_at_udf(F.col(text_col), F.col(first_pos_col))
    return joined.withColumn(
        "preview", collapse_whitespace_col(sent)
    ).drop(text_col)


def attach_ranked_previews(
    hydrated: DataFrame,
    texts: DataFrame,
    starts_col: str = "match_starts",
    lens_col: str = "match_lens",
    text_col: str = "text",
) -> DataFrame:
    """K4: results carrying ALL matched positions ⋈ texts → + preview =
    whitespace-collapsed best-quality sentence."""
    joined = hydrated.join(texts.select("doc_id", text_col), "doc_id", "left")
    sent = _best_sentence_udf()(
        F.col(text_col), F.col(starts_col), F.col(lens_col)
    )
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
    """Full preview pipeline for a search result list: recover ALL
    matched positions of the query terms per result doc from the
    segments, then pick the best-quality sentence. ``pages`` supplies
    (url, text)."""
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

    _, paths = catalog.resolve(index_dir)
    seg = read_term_segments(spark, paths["segments"], terms)
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
    match_pos: dict[int, list] = {}
    for r in rows:
        dec = decode_block(bytes(r.blob))
        pos = dec.get("positions")
        if pos is None:
            continue
        for i, d in enumerate(dec["doc_ids"]):
            d = int(d)
            if d in doc_ids and pos[i]:
                match_pos.setdefault(d, []).extend(
                    (int(s), int(ln)) for s, ln in pos[i]
                )
    rdf = spark.createDataFrame(
        [
            (
                int(d),
                float(s),
                [p[0] for p in sorted(match_pos.get(int(d), []))],
                [p[1] for p in sorted(match_pos.get(int(d), []))],
            )
            for s, d in results
        ],
        "doc_id long, score double, match_starts array<int>, "
        "match_lens array<int>",
    )
    docs = spark.read.parquet(paths["docs"]).select("doc_id", "url")
    texts = docs.join(pages.select("url", "text"), "url").select(
        "doc_id", "text"
    )
    return attach_ranked_previews(rdf.join(docs, "doc_id"), texts)
