"""Preview building (K4/P12/P13) and the interp-analysis sidecar."""

import pytest
from pyspark.sql import functions as F

from myaku_spark.operators.previews import preview_for_results
from myaku_spark.operators.search import IndexSearcher
from myaku_spark.plans.build_index import build_index
from myaku_spark.sources.pages import golden_pages_df

NOW = "2026-08-01 00:00:00"
LEX = {"雪曇り", "窓枠", "山賊"}


@pytest.fixture(scope="module")
def gidx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pidx"))
    build_index(
        spark, golden_pages_df(spark), d, n_groups=1, now=NOW,
        lexicon=LEX, with_analysis=True,
    )
    return d


def test_analysis_sidecar_sources(spark, gidx):
    an = spark.read.parquet(f"{gidx}/analysis")
    # Meta lexical items from the JMdict subset carry the three-key
    # sources (2=decomp, 3=surface; 雪曇り golden interp,
    # test_crawl.py:1206-1233) and their JMdict entry id.
    metas = an.filter(F.col("term") == "雪曇り").collect()
    assert metas
    assert any(r.sources == [2, 3] for r in metas)
    assert any(r.entry_id == "2098190" for r in metas)
    # Base segmenter tokens carry source 1.
    base = an.filter(F.col("term") == "けれども").collect()
    assert base and all(r.sources == [1] for r in base)
    # Position contract holds for analysis rows too.
    docs = spark.read.parquet(f"{gidx}/docs").select("doc_id", "url")
    url_text = {
        p["url"]: p["full_text"]
        for p in __import__("golden").golden_pages("initial")
    }
    id_url = {r.doc_id: r.url for r in docs.collect()}
    for r in metas[:5]:
        text = url_text[id_url[r.doc_id]]
        assert text[r.start : r.start + r.len] == "雪曇り"


def test_preview_contains_query_term(spark, gidx):
    searcher = IndexSearcher(spark, gidx)
    results = searcher.search(["山賊"], k=5)
    assert results
    pages = golden_pages_df(spark)
    pv = preview_for_results(spark, gidx, results, ["山賊"], pages)
    rows = pv.collect()
    assert len(rows) == len(results)
    for r in rows:
        assert r.preview and "山賊" in r.preview
        # Whitespace collapapsed: no raw newlines in previews.
        assert "\n" not in r.preview


def test_preview_empty_results(spark, gidx):
    pv = preview_for_results(
        spark, gidx, [], ["山賊"], golden_pages_df(spark)
    )
    assert pv.count() == 0


# --- K4 quality-bucketed sentence ranking (article_preview.py:37-62) ---------


def test_preview_quality_key_buckets():
    from myaku_spark.operators.previews import preview_quality_key as k

    assert k(70) == (2, 70) and k(90) == (2, 90)  # ideal
    assert k(50) == (1, 50) and k(69) == (1, 69)  # acceptable short
    assert k(91) == (0, 91) and k(100) == (0, 100)  # acceptable long
    assert k(49) == (-1, 49)  # too short
    assert k(101) == (-2, 101)  # too long
    # Bucket ordering: ideal > acceptable-short > acceptable-long >
    # too-short > too-long; longer wins within a bucket.
    assert k(80) > k(69) > k(100) > k(49) > k(101)
    assert k(85) > k(75) and k(60) > k(55)


def test_best_sentence_matches_reference_argmax():
    from myaku_spark.operators.previews import (
        best_preview_sentence,
        group_positions_by_sentence,
        preview_quality_key,
    )

    term = "山賊"
    s_short = term + "だ。"  # bucket -1
    s_long = term + "話" * 110 + "。"  # bucket -2
    s_ideal = "あの" + "森" * 65 + "に" + term + "がいた。"  # bucket 2
    text = s_short + s_long + s_ideal
    positions = []
    at = text.find(term)
    while at != -1:
        positions.append((at, len(term)))
        at = text.find(term, at + 1)
    assert len(positions) == 3

    # Reference argmax: groups sorted by start, stable reverse sort on
    # the quality key, first wins (article_preview.py:142-160).
    groups = group_positions_by_sentence(text, positions)
    expect_pos = sorted(
        groups, key=lambda g: preview_quality_key(g[0][1]), reverse=True
    )[0][0]
    expect = text[expect_pos[0] : expect_pos[0] + expect_pos[1]]
    got = best_preview_sentence(text, positions)
    assert got == expect
    assert got == s_ideal  # the ideal-length sentence, NOT the first match

    # Tie on the key → earliest sentence wins (stable reverse sort).
    t2 = term + "あ" * 60 + "。" + term + "い" * 60 + "。"
    p2 = [(0, len(term)), (t2.index(term, 1), len(term))]
    assert best_preview_sentence(t2, p2) == term + "あ" * 60 + "。"


def test_best_sentence_on_golden_articles():
    # The chosen sentence equals the reference key function's argmax on
    # every golden (term, article, positions) triple — K4 parity sweep.
    import golden

    from myaku_spark.operators.previews import (
        best_preview_sentence,
        group_positions_by_sentence,
        preview_quality_key,
    )

    flis = golden.golden_fli_expectations()
    texts = golden.golden_article_texts()
    checked = 0
    for term, docs in flis.items():
        for d in docs:
            text = texts.get(d.get("title"))
            if text is None or not d.get("positions"):
                continue
            positions = list(d["positions"])
            got = best_preview_sentence(text, positions)
            groups = group_positions_by_sentence(text, positions)
            expect = sorted(
                groups,
                key=lambda g: preview_quality_key(g[0][1]),
                reverse=True,
            )[0][0]
            assert got == text[expect[0] : expect[0] + expect[1]], (
                term, d.get("title"),
            )
            # The chosen sentence genuinely contains a match.
            s, ln = expect
            assert any(s <= p0 < s + ln for p0, _ in positions)
            checked += 1
    assert checked >= 20


def test_preview_prefers_quality_sentence_e2e(spark, gidx):
    # End-to-end: the preview column equals the quality argmax computed
    # from the article text + ALL golden positions of the query term.
    import re

    import golden

    from myaku_spark.operators.previews import best_preview_sentence

    searcher = IndexSearcher(spark, gidx)
    results = searcher.search(["山賊"], k=5)
    pages = golden_pages_df(spark)
    pv = preview_for_results(spark, gidx, results, ["山賊"], pages)
    docs = spark.read.parquet(f"{gidx}/docs").select("doc_id", "url")
    id_url = {r.doc_id: r.url for r in docs.collect()}
    url_title = {
        p["url"]: p["title"] for p in golden.golden_pages("initial")
    }
    texts = golden.golden_article_texts()
    gold_pos = {
        d["title"]: list(d["positions"])
        for d in golden.golden_fli_expectations().get("山賊", [])
    }
    verified = 0
    for r in pv.collect():
        title = url_title.get(id_url[r.doc_id])
        if title not in gold_pos:
            continue
        expect = best_preview_sentence(texts[title], gold_pos[title])
        assert r.preview == re.sub(r"\s+", "　", expect)
        verified += 1
    assert verified >= 1


def test_sample_segments_parity():
    # _create_sample_segments (article_preview.py:235-270): alternating
    # match/non-match runs, first-lstrip/last-rstrip, per-segment
    # whitespace collapse.
    from myaku_spark.operators.previews import (
        best_preview_sample,
        build_sample_segments,
    )

    text = "  山賊は森に住む。山賊の憎悪だ。"
    sent = (0, 10)  # "  山賊は森に住む。"
    pos = [(2, 2)]  # 山賊
    segs = build_sample_segments(text, sent, pos)
    # The leading-whitespace segment is LSTRIPPED but kept in the list,
    # exactly like the reference (segments[0].text = ...lstrip()).
    assert segs == [(False, ""), (True, "山賊"), (False, "は森に住む。")]
    # Adjacent match runs stay separate segments.
    sent2 = (10, 7)  # "山賊の憎悪だ。"
    segs2 = build_sample_segments(text, sent2, [(12, 1), (13, 2)])
    assert segs2 == [
        (False, "山賊"), (True, "の"), (True, "憎悪"), (False, "だ。")
    ]
    # Reassembled segments equal the sentence.
    assert "".join(t for _, t in segs2) == "山賊の憎悪だ。"
    # best_preview_sample returns the argmax sentence plus its segments.
    sample = best_preview_sample(text, [(2, 2), (12, 1), (13, 2)])
    assert sample is not None
    sentence, segs3 = sample
    assert "".join(t for _, t in segs3) == sentence.strip().replace("\n", "　")


# --- ArticlePreview trim/expand parity (article_preview.py:272-827) ---------
# Hand-computed goldens on articles engineered to hit each strategy; the
# reference quirks (first-segment left_added in full-left, single-char
# balance prepend, start-index behavior) are asserted, not corrected.


def test_trim_full_left_remainder_right():
    from myaku_spark.operators.previews import ArticlePreview

    text = "x" * 10 + "MM" + "y" * 138 + "。"  # one 151-char sentence
    p = ArticlePreview(text, [(10, 2)])
    s = p.main_sample
    assert s["segments"] == [
        (False, "x" * 10),
        (True, "MM"),
        (False, "y" * 88),
        (False, "..."),
    ]
    assert s["start"] == 0  # += 10 (cut lead) -= 10 (first-seg quirk)
    assert not p.extra_samples


def test_trim_full_right_remainder_left():
    from myaku_spark.operators.previews import ArticlePreview

    text = "x" * 140 + "MM" + "y" * 7 + "。"  # 150-char sentence
    p = ArticlePreview(text, [(140, 2)])
    s = p.main_sample
    assert s["segments"] == [
        (False, "..."),
        (False, "x" * 90),
        (True, "MM"),
        (False, "y" * 7 + "。"),
    ]
    assert s["start"] == 50  # 140 lead chars cut, 90 re-prepended


def test_trim_left_right_balance_single_char_quirk():
    from myaku_spark.operators.previews import ArticlePreview

    text = "x" * 150 + "MM" + "y" * 147 + "。"  # 300-char sentence
    p = ArticlePreview(text, [(150, 2)])
    s = p.main_sample
    # remaining=98 → left gets prev_text[-49] (ONE char — the
    # reference's missing-colon quirk, article_preview.py:419-422),
    # right gets next_text[:49].
    assert s["segments"] == [
        (False, "..."),
        (False, "x"),
        (True, "MM"),
        (False, "y" * 49),
        (False, "..."),
    ]
    assert s["start"] == 149


def test_expand_short_sentence_with_neighbors():
    from myaku_spark.operators.previews import ArticlePreview

    s1 = "あ" * 29 + "。"  # 30
    s2 = "い" * 19 + "。"  # 20, contains the match
    s3 = "う" * 24 + "。"  # 25
    s4 = "え" * 39 + "。"  # 40
    text = s1 + s2 + s3 + s4
    p = ArticlePreview(text, [(30, 2)])
    s = p.main_sample
    # 20 → +s1 (50, toward ideal) → +s3 (75, lands in 70-90 ideal
    # band) → s4 refused (75 already ideal). Start moves to s1.
    assert s["segments"] == [
        (False, s1),
        (True, "いい"),
        (False, "い" * 17 + "。"),
        (False, s3),
    ]
    assert s["start"] == 0


def test_force_expand_partial_left_sentence():
    from myaku_spark.operators.previews import ArticlePreview

    left = "あ" * 199 + "。"  # 200 — full-sentence expand refused
    m = "い" * 19 + "。"  # 20, match at its start
    text = left + m
    p = ArticlePreview(text, [(200, 2)])
    s = p.main_sample
    # should_expand refuses 20→220 (overshoots ideal by more than the
    # shortfall), both passes; force-expand-left then takes the TAIL of
    # the left sentence up to the 100-char cap with a '...' marker.
    assert s["segments"] == [
        (False, "..."),
        (False, "あ" * 79 + "。"),
        (True, "いい"),
        (False, "い" * 17 + "。"),
    ]
    # start stays at the sample sentence (reference: force-expand only
    # moves text_start_index on FULL sentence adds).
    assert s["start"] == 200


def test_extra_samples_caps():
    from myaku_spark.operators.previews import ArticlePreview

    # Three matched sentences, article long enough that 15% allows two
    # samples but not three.
    s1 = "あ" * 70 + "M" + "あ" * 9 + "。"  # 81, ideal bucket
    s2 = "い" * 60 + "M" + "い" * 9 + "。"  # 71, ideal bucket
    s3 = "う" * 40 + "M" + "う" * 9 + "。"  # 51, acceptable-short
    filler = ("ん" * 99 + "。") * 8  # pad article to 1003 chars
    text = s1 + s2 + s3 + filler
    p = ArticlePreview(text, [(70, 1), (81 + 60, 1), (81 + 71 + 40, 1)])
    # main = best quality bucket (s1, ideal-length, already in band so
    # no expansion fires).
    assert p.main_sample["start"] == 0
    assert p.main_sample["segments"] == [
        (False, "あ" * 70),
        (True, "M"),
        (False, "あ" * 9 + "。"),
    ]
    # s2 would push cumulative preview length to 152/1003 > 15% of the
    # article → popped; sampling stops (the reference's
    # _MAX_PREVIEW_ARTICLE_PERCENT gate, article_preview.py:185-193).
    assert p.extra_samples == []


def test_attach_full_previews_distributed(spark):
    # The full trim/expand shaping as a distributed operator: the UDF
    # output must equal a direct ArticlePreview run per row.
    import json

    from myaku_spark.operators.previews import (
        ArticlePreview,
        attach_full_previews,
    )

    text_long = "x" * 10 + "MM" + "y" * 138 + "。"  # trim path
    text_short = (
        "あ" * 29 + "。" + "い" * 19 + "。" + "う" * 24 + "。" + "え" * 39 + "。"
    )  # expand path
    rows = [(1, [10], [2]), (2, [30], [2]), (3, None, None)]
    hyd = spark.createDataFrame(
        rows, "doc_id long, match_starts array<int>, match_lens array<int>"
    )
    texts = spark.createDataFrame(
        [(1, text_long), (2, text_short)], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r.preview_json
        for r in attach_full_previews(hyd, texts).collect()
    }
    for doc_id, text, pos in [(1, text_long, [(10, 2)]), (2, text_short, [(30, 2)])]:
        p = ArticlePreview(text, pos)
        want_main = {
            "textStartPos": p.main_sample["start"],
            "segments": [
                {"isQueryMatch": m, "text": t}
                for m, t in p.main_sample["segments"]
            ],
        }
        got = json.loads(out[doc_id])
        assert got["main"] == want_main, doc_id
    assert out[3] is None  # no positions → no preview


def test_preview_never_collects_head_term_block_metadata(
    spark, tmp_path, monkeypatch
):
    # r5 verdict #1: the old preview position recovery collected
    # (term, block_id, min_doc, max_doc) for EVERY block of every result
    # term, a driver-side set proportional to a head term's block count.
    # Build an index where a head term has one block PER DOC
    # (block_doc_range=1), then assert the whole preview pipeline —
    # construction AND materialization — never collects anything larger
    # than the result set, while outputs stay correct.
    from myaku_spark.sources.pages import synth_pages_df

    d = str(tmp_path / "many_block_idx")
    n_docs = 150
    pages = synth_pages_df(spark, n_docs, partitions=4)
    build_index(
        spark, pages, d, n_groups=1, now=NOW,
        block_doc_range=1, head_df_threshold=10,
    )

    term = (
        spark.read.parquet(f"{d}/term_stats")
        .orderBy(F.desc("df"), "term")
        .limit(1)
        .collect()[0]
        .term
    )
    n_blocks = (
        spark.read.parquet(f"{d}/segments")
        .filter(F.col("term") == term)
        .count()
    )
    assert n_blocks >= 50  # genuinely a many-block head term

    searcher = IndexSearcher(spark, d)
    results = searcher.search([term], k=5)
    assert results

    cls = type(spark.range(1))
    sizes = []
    orig = cls.collect

    def counting_collect(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", counting_collect)
    pv = preview_for_results(spark, d, results, [term], pages)
    rows = pv.collect()
    monkeypatch.setattr(cls, "collect", orig)

    assert len(rows) == len(results)
    assert all(r.preview and term in r.preview for r in rows)
    # Only result-sized materializations ever reached the driver — the
    # block metadata (>= n_blocks rows) stayed in the executors.
    assert sizes and max(sizes) <= len(results), sorted(sizes)[-5:]
