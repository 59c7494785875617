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
