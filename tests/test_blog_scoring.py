"""Blog dimension (J2) end-to-end + golden quality-score parity.

The reference's article quality score is a 5-factor weighted sum
(length, blog_order, blog_rating, video, recency; scorer/__init__.py:
27-60) with the blog factors hydrated through the JpnArticleBlog entity.
These tests assert EXACT parity of the full score against every golden
article doc's expected quality_score (test_crawl.py:194-835), at the
reference's frozen scoring instants, through the same broadcast
blog-hydration join the index build uses.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from golden import (
    GOLDEN_INITIAL_NOW,
    GOLDEN_UPDATE_NOW,
    golden_article_meta,
    golden_blog_docs,
)

from myaku_spark.operators.scoring import (
    attach_blog_dimension,
    full_article_score_col,
)
from myaku_spark.sources.blogs import (
    BLOG_MAP_SCHEMA,
    golden_blogs_df,
    synth_blog_map_df,
    synth_blogs_df,
)


def _score_stage(spark, articles: list[dict], blogs_df, now: str) -> dict:
    """Run the production scoring path over golden article metadata;
    returns url → computed score."""
    blog_by_title = {}
    for d in golden_blog_docs()[0] + golden_blog_docs()[1]:
        blog_by_title[d["title"]] = d
    doc_rows = []
    map_rows = []
    for a in articles:
        doc_rows.append(
            (
                a["source_url"],
                dt.datetime.fromisoformat(a["last_updated_datetime"]),
                int(a["alnum_count"]),
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
    docs = spark.createDataFrame(
        doc_rows, "url string, warc_ts timestamp, alnum long"
    )
    bmap = spark.createDataFrame(map_rows, BLOG_MAP_SCHEMA)
    scored = attach_blog_dimension(docs, bmap, blogs_df).withColumn(
        "score", full_article_score_col(F.lit(now).cast("timestamp"))
    )
    return {r.url: r.score for r in scored.collect()}


def test_golden_quality_score_parity_initial(spark):
    initial, _ = golden_article_meta()
    got = _score_stage(
        spark, initial, golden_blogs_df(spark, "initial"), GOLDEN_INITIAL_NOW
    )
    checked = 0
    for a in initial:
        assert got[a["source_url"]] == a["quality_score"], a["title"]
        checked += 1
    assert checked >= 16


def test_golden_quality_score_parity_update(spark):
    _, update = golden_article_meta()
    got = _score_stage(
        spark, update, golden_blogs_df(spark, "update"), GOLDEN_UPDATE_NOW
    )
    checked = 0
    for a in update:
        assert got[a["source_url"]] == a["quality_score"], a["title"]
        checked += 1
    assert checked >= 5


def test_build_index_with_blog_dimension(spark, tmp_path):
    """The blog factors flow through the real index build: docs built
    WITH the blog dimension score differently from docs built without,
    and the rank order reflects blog ratings."""
    from myaku_spark.plans.build_index import build_index
    from myaku_spark.sources.pages import synth_pages_df

    d1 = str(tmp_path / "noblog")
    d2 = str(tmp_path / "blog")
    pages = synth_pages_df(spark, 60, partitions=2)
    build_index(spark, pages, d1, n_groups=1, now="2026-08-01 00:00:00")
    build_index(
        spark,
        pages,
        d2,
        n_groups=1,
        now="2026-08-01 00:00:00",
        blogs=synth_blogs_df(spark),
        blog_map=synth_blog_map_df(spark, 60),
    )
    s1 = {r.url: r.doc_score for r in spark.read.parquet(f"{d1}/docs").collect()}
    s2 = {r.url: r.doc_score for r in spark.read.parquet(f"{d2}/docs").collect()}
    assert set(s1) == set(s2)
    diffs = {u: s2[u] - s1[u] for u in s1}
    assert any(v != 0 for v in diffs.values())
    # Blog-factor delta is exactly order*1 + rating*2 + video*1 factors.
    from myaku_spark.operators.scoring import (
        KAKUYOMU_STAR_BUCKETS,
        bucket_score,
    )
    from myaku_spark.sources.blogs import synth_blog_map_rows

    for row in synth_blog_map_rows(60):
        url, blog_url, _, order, section, video = row
        k = int(blog_url.rsplit("-", 1)[1])
        rating = (k * 13) % 120
        expect = (
            (1000 if order == 1 else (500 if section == 1 else 0)) * 1
            + bucket_score(int(rating), KAKUYOMU_STAR_BUCKETS) * 2
            + (1000 if video else 0) * 1
        )
        assert diffs[url] == expect, (url, diffs[url], expect)
