"""K1 golden rank identity END-TO-END, replicating the reference's own
two-crawl e2e scenario: build the index from the golden INITIAL corpus
through the full production pipeline (extract → dictionary tokenize →
blog-hydrated 5-factor scoring → compressed segments), then apply the
UPDATE crawl through the incremental path, and assert that WAND search
results for every reference query term come back in EXACTLY the order
and with EXACTLY the scores the golden FLI expectations imply:
(quality_score_exact DESC, last_updated DESC) — our rank key
(score DESC, doc_id DESC) with ids assigned by global
(warc_ts=last_updated, url) rank and delta-group ids above base ids
(the reference's insertion-order ObjectId tie-break)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from golden import (
    GOLDEN_INITIAL_NOW,
    GOLDEN_UPDATE_NOW,
    golden_article_meta,
    golden_article_texts,
    golden_blog_docs,
    golden_fli_score_docs,
)

from myaku_spark.operators.search import IndexSearcher
from myaku_spark.plans.build_index import build_index
from myaku_spark.plans.incremental import incremental_update
from myaku_spark.sources.blogs import BLOG_MAP_SCHEMA, golden_blogs_df
from myaku_spark.sources.pages import PAGES_SCHEMA


def _pages_and_map(spark, articles):
    texts = golden_article_texts()
    blog_by_title = {
        b["title"]: b for b in golden_blog_docs()[0] + golden_blog_docs()[1]
    }
    page_rows, map_rows = [], []
    for a in articles:
        page_rows.append(
            (
                a["source_url"],
                dt.datetime.fromisoformat(a["last_updated_datetime"]),
                b"",  # empty html → extraction null → falls back to text
                texts[a["title"]],
                "ja",
            )
        )
        blog = blog_by_title.get(a.get("blog_oid") or "")
        map_rows.append(
            (
                a["source_url"],
                blog["source_url"] if blog else None,
                a["source_name"],
                a.get("blog_article_order_num"),
                a.get("blog_section_order_num"),
                bool(a.get("has_video")),
            )
        )
    return (
        spark.createDataFrame(page_rows, PAGES_SCHEMA),
        spark.createDataFrame(map_rows, BLOG_MAP_SCHEMA),
    )


@pytest.fixture(scope="module")
def golden_two_crawl_idx(spark, tmp_path_factory):
    """Initial crawl (full build) + update crawl (incremental): the
    reference e2e flow."""
    d = str(tmp_path_factory.mktemp("grank_idx"))
    initial, update = golden_article_meta()
    pages_i, map_i = _pages_and_map(spark, initial)
    build_index(
        spark,
        pages_i,
        d,
        n_groups=1,
        now=GOLDEN_INITIAL_NOW,
        blogs=golden_blogs_df(spark, "initial"),
        blog_map=map_i,
    )
    initial_titles = {a["title"] for a in initial}

    pages_u, map_u = _pages_and_map(spark, update)
    row = incremental_update(
        spark,
        d,
        pages_u,
        now=GOLDEN_UPDATE_NOW,
        blogs=golden_blogs_df(spark, "update"),
        blog_map=map_u,
    )
    assert row is not None and row["docs"] == len(update)

    url_title = {
        a["source_url"]: a["title"] for a in initial + update
    }
    docs = spark.read.parquet(f"{d}/docs").select("doc_id", "url").collect()
    id_title = {r.doc_id: url_title[r.url] for r in docs}
    return d, id_title, initial_titles


def _expected_order(term_docs, titles):
    expect = [g for g in term_docs if g["article_oid"] in titles]
    # Dedup by article (initial docs appear in both stage expectations
    # with identical scores — deepcopy semantics).
    seen = set()
    uniq = []
    for g in expect:
        if g["article_oid"] in seen:
            continue
        seen.add(g["article_oid"])
        uniq.append(g)
    uniq.sort(
        key=lambda g: (
            g["quality_score_exact"],
            g["article_last_updated_datetime"],
        ),
        reverse=True,
    )
    return uniq


def test_initial_crawl_rank_identity(spark, golden_two_crawl_idx):
    d, id_title, initial_titles = golden_two_crawl_idx
    searcher = IndexSearcher(spark, d, mode="myaku")
    checked = 0
    for term, docs in golden_fli_score_docs().items():
        expect = _expected_order(docs, initial_titles)
        if not expect:
            continue
        # Only initial-stage docs for the initial check: restrict by
        # filtering the search hits to initial titles (the index now
        # also holds update docs; the ORDER among initial docs must
        # still match the initial expectations).
        hits = [
            (id_title[doc], score)
            for score, doc in searcher.search([term], k=30, combine="or")
            if id_title[doc] in initial_titles
        ]
        assert [t for t, _ in hits] == [g["article_oid"] for g in expect], term
        assert [s for _, s in hits] == [
            float(g["quality_score_exact"]) for g in expect
        ], term
        checked += 1
    assert checked == 11


def test_update_crawl_rank_identity(spark, golden_two_crawl_idx):
    """After the incremental update crawl, ALL 14 reference query terms
    (11 initial + 吾輩/恰幅/美しさ) return the golden update-stage
    ordering and scores — including terms whose result set mixes
    initial-crawl and update-crawl documents (自然, だから)."""
    d, id_title, _ = golden_two_crawl_idx
    all_titles = set(id_title.values())
    searcher = IndexSearcher(spark, d, mode="myaku")
    checked = 0
    mixed_terms = 0
    initial_titles = {a["title"] for a in golden_article_meta()[0]}
    for term, docs in golden_fli_score_docs().items():
        expect = _expected_order(docs, all_titles)
        if not expect:
            continue
        hits = searcher.search([term], k=30, combine="or")
        got = [(id_title[doc], score) for score, doc in hits]
        assert [t for t, _ in got] == [g["article_oid"] for g in expect], term
        assert [s for _, s in got] == [
            float(g["quality_score_exact"]) for g in expect
        ], term
        assert hits == searcher.search(
            [term], k=30, combine="or", exhaustive=True
        ), term
        stages = {t in initial_titles for t, _ in got}
        if stages == {True, False}:
            mixed_terms += 1
        checked += 1
    assert checked == 14
    assert mixed_terms >= 2  # 自然 and だから span both crawls
