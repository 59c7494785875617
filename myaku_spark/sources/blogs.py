"""Blog dimension (J2): the reference's JpnArticleBlog entity
(datatypes.py:75-112) as a broadcastable dimension table, plus the
article→blog map carrying the per-article blog fields
(blog_article_order_num / blog_section_order_num / has_video).

The reference gets these by crawling each series' landing page
(kakuyomu.py series crawl) and hydrates search results through the blog
oid (datastore/index_search.py:84-93); here the same data arrives as two
small tables joined broadcast-side — at 10^12 articles the blogs
dimension is ~#series rows, always the broadcast side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

BLOGS_SCHEMA = StructType(
    [
        StructField("blog_url", StringType()),
        StructField("title", StringType()),
        StructField("author", StringType()),
        StructField("source_name", StringType()),
        StructField("rating", LongType()),
        StructField("rating_count", LongType()),
        StructField("article_count", IntegerType()),
        StructField("total_char_count", LongType()),
        StructField("comment_count", LongType()),
        StructField("follower_count", LongType()),
        StructField("in_serialization", BooleanType()),
        StructField("last_updated", TimestampType()),
    ]
)

BLOG_MAP_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("blog_url", StringType()),
        StructField("source_name", StringType()),
        StructField("blog_article_order_num", IntegerType()),
        StructField("blog_section_order_num", IntegerType()),
        StructField("has_video", BooleanType()),
    ]
)


def synth_blogs_df(spark: SparkSession, n_series: int = 97) -> DataFrame:
    """Deterministic blogs dimension for the synth corpus: one blog per
    series-{k}; ratings sweep every Kakuyomu star bucket."""
    import datetime as dt

    rows = []
    for k in range(n_series):
        rows.append(
            (
                f"https://synth.example.jp/series-{k}",
                f"Synth Series {k}",
                f"Synth Author {k % 11}",
                "Kakuyomu",
                (k * 13) % 120,  # hits every star bucket incl. >100
                (k * 7) % 300,
                1 + k % 9,
                1000 + 137 * k,
                k % 40,
                (k * 3) % 500,
                k % 2 == 0,
                dt.datetime(2026, 1, 1) + dt.timedelta(hours=k),
            )
        )
    return spark.createDataFrame(rows, BLOGS_SCHEMA)


def synth_blog_map_rows(n: int) -> list[tuple]:
    """Pure-Python twin of the article→blog map for synth_page(i):
    url .../series-{i%97}/episode-{i}; order within the series is
    i // 97 + 1; sections rotate every 4 episodes; a sprinkle of video
    articles exercises the video factor."""
    rows = []
    for i in range(n):
        k = i % 97
        order = i // 97 + 1
        section_order = (i // 97) % 4 + 1
        rows.append(
            (
                f"https://synth.example.jp/series-{k}/episode-{i}",
                f"https://synth.example.jp/series-{k}",
                "Kakuyomu",
                order,
                section_order,
                i % 13 == 0,
            )
        )
    return rows


def synth_blog_map_df(spark: SparkSession, n: int) -> DataFrame:
    return spark.createDataFrame(synth_blog_map_rows(n), BLOG_MAP_SCHEMA)


def golden_blogs_df(spark: SparkSession, stage: str = "initial") -> DataFrame:
    """Blogs dimension from the reference golden fixtures (tests)."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    import datetime as dt

    from golden import golden_blog_docs

    initial, update = golden_blog_docs()
    docs = initial if stage == "initial" else update
    rows = []
    for d in docs:
        rows.append(
            (
                d["source_url"],
                d.get("title"),
                d.get("author"),
                d.get("source_name"),
                int(d.get("rating") or 0),
                int(d.get("rating_count") or 0),
                int(d.get("article_count") or 0),
                int(d.get("total_char_count") or 0),
                int(d["comment_count"]) if d.get("comment_count") is not None else None,
                int(d.get("follower_count") or 0),
                bool(d.get("in_serialization")),
                dt.datetime.fromisoformat(d["last_updated_datetime"])
                if d.get("last_updated_datetime")
                else None,
            )
        )
    return spark.createDataFrame(rows, BLOGS_SCHEMA)
