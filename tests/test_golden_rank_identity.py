"""K1 golden rank identity END-TO-END: build the index from the golden
corpus through the full production pipeline (extract → dictionary
tokenize → blog-hydrated 5-factor scoring → compressed segments) and
assert that WAND search results for every reference query term come
back in EXACTLY the order and with EXACTLY the scores the reference's
golden FLI expectations imply: (quality_score_exact DESC,
last_updated DESC) — our rank key (score DESC, doc_id DESC) with ids
assigned by global (warc_ts=last_updated, url) rank."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from golden import (
    GOLDEN_INITIAL_NOW,
    golden_article_meta,
    golden_article_texts,
    golden_blog_docs,
    golden_fli_score_docs,
)

from myaku_spark.operators.search import IndexSearcher
from myaku_spark.plans.build_index import build_index
from myaku_spark.sources.blogs import BLOG_MAP_SCHEMA, golden_blogs_df
from myaku_spark.sources.pages import PAGES_SCHEMA


@pytest.fixture(scope="module")
def golden_scored_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("grank_idx"))
    initial, _ = golden_article_meta()
    texts = golden_article_texts()
    blog_by_title = {
        b["title"]: b for b in golden_blog_docs()[0] + golden_blog_docs()[1]
    }
    page_rows, map_rows = [], []
    for a in initial:
        page_rows.append(
            (
                a["source_url"],
                dt.datetime.fromisoformat(a["last_updated_datetime"]),
                b"",  # empty html → extraction null → falls back to text col
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
    pages = spark.createDataFrame(page_rows, PAGES_SCHEMA)
    build_index(
        spark,
        pages,
        d,
        n_groups=1,
        now=GOLDEN_INITIAL_NOW,
        blogs=golden_blogs_df(spark, "initial"),
        blog_map=spark.createDataFrame(map_rows, BLOG_MAP_SCHEMA),
    )
    url_title = {a["source_url"]: a["title"] for a in initial}
    docs = spark.read.parquet(f"{d}/docs").select("doc_id", "url").collect()
    id_title = {r.doc_id: url_title[r.url] for r in docs}
    return d, id_title


def test_golden_rank_identity_all_reference_terms(spark, golden_scored_idx):
    d, id_title = golden_scored_idx
    initial_titles = set(id_title.values())
    searcher = IndexSearcher(spark, d, mode="myaku")
    flis = golden_fli_score_docs()
    checked_terms = 0
    for term, docs in flis.items():
        expect = [g for g in docs if g["article_oid"] in initial_titles]
        if not expect:
            continue
        expect.sort(
            key=lambda g: (
                g["quality_score_exact"],
                g["article_last_updated_datetime"],
            ),
            reverse=True,
        )
        hits = searcher.search([term], k=20, combine="or")
        got = [(id_title[doc], score) for score, doc in hits]
        assert [t for t, _ in got] == [g["article_oid"] for g in expect], term
        assert [s for _, s in got] == [
            float(g["quality_score_exact"]) for g in expect
        ], term
        # WAND == exhaustive on the golden index too.
        assert hits == searcher.search([term], k=20, combine="or",
                                       exhaustive=True), term
        checked_terms += 1
    assert checked_terms == 11  # the initial-crawl reference query set
