"""End-to-end index build: extract → dedupe → tokenize → segments →
checkpoints, then search parity (WAND == exhaustive == DataFrame oracle)
and resumability."""

import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from myaku_spark.functions.tokenize import explode_ja_tokens
from myaku_spark.operators.postings import build_postings
from myaku_spark.operators.scoring import tf_score_mod_col
from myaku_spark.operators.search import IndexSearcher
from myaku_spark.plans.build_index import build_index
from myaku_spark.sources.pages import synth_pages_df

N_PAGES = 150
NOW = "2026-08-01 00:00:00"


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx"))
    pages = synth_pages_df(spark, N_PAGES, partitions=4)
    metrics = build_index(spark, pages, d, n_groups=3, now=NOW)
    assert len(metrics) == 3
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _oracle_scored(spark, index_dir):
    docs = spark.read.parquet(f"{index_dir}/docs")
    texts = docs.select("doc_id", "doc_score", "doc_ts").join(
        spark.read.parquet(f"{index_dir}/docs").select("doc_id"), "doc_id"
    )
    return docs


def test_checkpoints_and_metrics(spark, index_dir):
    cp = spark.read.parquet(f"{index_dir}/checkpoints")
    rows = cp.collect()
    assert len(rows) == 3
    assert all(r.status == "done" for r in rows)
    assert sum(r.docs for r in rows) > 0
    assert all(r.terms > 0 and r.bytes > 0 and r.wall_ms >= 0 for r in rows)
    n_docs = spark.read.parquet(f"{index_dir}/docs").count()
    assert sum(r.docs for r in rows) == n_docs


def test_resume_skips_completed_groups(spark, index_dir):
    pages = synth_pages_df(spark, N_PAGES, partitions=4)
    metrics = build_index(spark, pages, index_dir, n_groups=3, now=NOW)
    assert metrics == []  # everything checkpointed → no work


def test_search_wand_equals_exhaustive(spark, index_dir):
    searcher = IndexSearcher(spark, index_dir, mode="myaku")
    tstats = (
        spark.read.parquet(f"{index_dir}/term_stats")
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df"))
        .limit(8)
        .collect()
    )
    terms = [r.term for r in tstats]
    assert terms
    for t in terms[:4]:
        assert searcher.search([t], k=10) == searcher.search(
            [t], k=10, exhaustive=True
        )
    for pair in [terms[:2], terms[2:4], terms[:3]]:
        for combine in ("and", "or"):
            got = searcher.search(pair, k=10, combine=combine)
            exp = searcher.search(pair, k=10, combine=combine, exhaustive=True)
            assert got == exp, (pair, combine)


def test_search_matches_dataframe_oracle(spark, index_dir):
    """Single-term myaku-rank top-k == window top-k over re-derived
    postings (K1 oracle)."""
    docs = spark.read.parquet(f"{index_dir}/docs")
    # Re-derive text from synth generator through the docs table join.
    pages = synth_pages_df(spark, N_PAGES, partitions=4).select("url", "text")
    docs_t = docs.join(pages, "url")
    tokens = explode_ja_tokens(docs_t, "text", "doc_id")
    postings = build_postings(tokens)
    scored = (
        postings.join(docs.select("doc_id", "doc_score"), "doc_id")
        .withColumn(
            "score",
            (F.col("doc_score") + tf_score_mod_col(F.col("tf"))).cast("long"),
        )
    )
    top_term = (
        postings.groupBy("term").count().orderBy(F.desc("count")).limit(1).collect()
    )[0].term
    w = Window.partitionBy("term").orderBy(F.desc("score"), F.desc("doc_id"))
    expected = [
        (float(r.score), r.doc_id)
        for r in scored.filter(F.col("term") == top_term)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .orderBy("rank")
        .collect()
    ]
    searcher = IndexSearcher(spark, index_dir, mode="myaku")
    assert searcher.search([top_term], k=10) == expected


def test_hydration_and_pagination(spark, index_dir):
    searcher = IndexSearcher(spark, index_dir, mode="myaku")
    tstats = (
        spark.read.parquet(f"{index_dir}/term_stats")
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df"))
        .limit(1)
        .collect()
    )
    term = tstats[0].term
    page1 = searcher.search_page([term], page_num=1, k=5).collect()
    page2 = searcher.search_page([term], page_num=2, k=5).collect()
    assert len(page1) == 5
    assert {r.doc_id for r in page1}.isdisjoint({r.doc_id for r in page2})
    assert all(r.url is not None for r in page1)


def test_dedup_first_writer_wins(spark, tmp_path):
    """Identical text under two urls → one doc survives (P9/J4)."""
    import datetime as dt

    from myaku_spark.plans.build_index import extract_and_dedupe
    from myaku_spark.sources.pages import PAGES_SCHEMA, synth_page

    p = synth_page(7)
    rows = [
        ("https://synth.example.jp/a", dt.datetime(2026, 1, 2), p["html"], p["text"], "ja"),
        ("https://synth.example.jp/b", dt.datetime(2026, 1, 1), p["html"], p["text"], "ja"),
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    out = extract_and_dedupe(pages).collect()
    assert len(out) == 1
    assert out[0].url == "https://synth.example.jp/b"  # earliest warc_ts wins


def test_dedup_corpus_wide_across_groups(spark, tmp_path):
    """Identical text under urls hashing to DIFFERENT partition groups is
    indexed once (db-wide first-writer-wins via the materialized
    extraction stage — the reference's can_store_article checks the
    whole db, index_build.py:116-143)."""
    import datetime as dt

    from myaku_spark.plans.build_index import _group_col, build_index
    from myaku_spark.sources.pages import PAGES_SCHEMA, synth_page

    n_groups = 4
    p = synth_page(11)
    # Find two urls that land in different groups.
    urls = [f"https://synth.example.jp/dup-{i}" for i in range(32)]
    gdf = spark.createDataFrame([(u,) for u in urls], ["url"]).select(
        "url", _group_col(F.col("url"), n_groups).alias("g")
    )
    by_group = {}
    for r in gdf.collect():
        by_group.setdefault(r.g, r.url)
    two = list(by_group.values())[:2]
    assert len(two) == 2
    rows = [
        (two[0], dt.datetime(2026, 1, 1), p["html"], p["text"], "ja"),
        (two[1], dt.datetime(2026, 1, 2), p["html"], p["text"], "ja"),
    ]
    d = str(tmp_path / "xgidx")
    build_index(
        spark, spark.createDataFrame(rows, PAGES_SCHEMA), d, n_groups=n_groups
    )
    docs = spark.read.parquet(f"{d}/docs").collect()
    assert len(docs) == 1
    assert docs[0].url == two[0]  # earliest warc_ts wins across groups


def test_assign_doc_ids_global_rank(spark):
    """Ids are the exact dense GLOBAL rank under (warc_ts, url) — the
    rank-key tie-break contract (reference: last_updated DESC, id DESC)
    — and deterministic across evaluations."""
    import datetime as dt

    from myaku_spark.operators.ids import assign_doc_ids

    rows = [
        (f"https://x.jp/{(i * 37) % 1000:04d}", dt.datetime(2026, 1, 1)
         + dt.timedelta(minutes=(i * 13) % 500))
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp").persist()
    df.count()
    out = assign_doc_ids(df, ["warc_ts", "url"], n_buckets=16)
    got = [(r.warc_ts, r.url, r.doc_id) for r in out.collect()]
    expect_order = sorted((w, u) for u, w in rows)
    by_id = sorted(got, key=lambda t: t[2])
    assert [t[2] for t in by_id] == list(range(1000))  # dense 0..n-1
    assert [(t[0], t[1]) for t in by_id] == expect_order  # global rank
    # Deterministic: a second evaluation assigns identical ids.
    again = {(r.warc_ts, r.url): r.doc_id for r in
             assign_doc_ids(df, ["warc_ts", "url"], n_buckets=16).collect()}
    assert all(again[(w, u)] == i for w, u, i in got)
    df.unpersist()


def test_pages_format_roundtrip(spark, tmp_path):
    """json/csv/orc landing formats round-trip byte-identical pages
    (html carried base64 in the text formats)."""
    from myaku_spark.sources.pages import read_pages, synth_pages_df, write_pages

    src = synth_pages_df(spark, 6, partitions=2).withColumn(
        # force sub-second precision into the round-trip (parquet
        # timestamps are micros; text formats must not truncate)
        "warc_ts",
        F.col("warc_ts") + F.expr("INTERVAL 123456 MICROSECONDS"),
    )
    expect = {
        r.url: (bytes(r.html), r.text, r.warc_ts, r.lang)
        for r in src.collect()
    }
    for fmt in ("orc", "json", "csv"):
        p = str(tmp_path / f"pages_{fmt}")
        write_pages(src, p, fmt=fmt)
        got = {
            r.url: (bytes(r.html), r.text, r.warc_ts, r.lang)
            for r in read_pages(spark, p, fmt=fmt).collect()
        }
        assert got == expect, fmt


def test_pages_avro_roundtrip_gated(spark, tmp_path):
    """Avro is an external-but-bundled Spark module in real
    distributions; the jar is absent in this sandbox, so the roundtrip
    is gated (skipped, not passed) — same policy as the Iceberg
    smoke."""
    import pytest

    from myaku_spark.sources.pages import read_pages, synth_pages_df, write_pages

    src = synth_pages_df(spark, 6, partitions=2)
    p = str(tmp_path / "pages_avro")
    try:
        write_pages(src, p, fmt="avro")
    except Exception as e:  # AnalysisException: failed to find source
        if "avro" in str(e).lower():
            pytest.skip("spark-avro jar not on the classpath")
        raise
    expect = {
        r.url: (bytes(r.html), r.text, r.warc_ts, r.lang)
        for r in src.collect()
    }
    got = {
        r.url: (bytes(r.html), r.text, r.warc_ts, r.lang)
        for r in read_pages(spark, p, fmt="avro").collect()
    }
    assert got == expect
