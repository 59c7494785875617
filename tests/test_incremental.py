"""Incremental re-index (changed-url detection, tombstones, delta group)
and partition-pruned recency rescore."""

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from myaku_spark.operators.search import IndexSearcher
from myaku_spark.plans.build_index import build_index
from myaku_spark.plans.incremental import (
    detect_changes,
    docs_needing_rescore,
    incremental_update,
    load_tombstones,
    rescore_index,
)
from myaku_spark.sources.pages import PAGES_SCHEMA, synth_page, synth_pages_df

NOW = "2026-08-01 00:00:00"
N = 80


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("incr_idx"))
    pages = synth_pages_df(spark, N, partitions=4)
    build_index(spark, pages, d, n_groups=2, now=NOW)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _modified_pages(spark, n_changed=3, n_new=2):
    rows = []
    for i in range(n_changed):  # existing urls, new content (new HTML —
        # change detection hashes the EXTRACTED text)
        p_old = synth_page(i)
        p_new = synth_page(i + 5000)
        rows.append(
            (
                p_old["url"],
                dt.datetime(2026, 2, 1),
                p_new["html"],
                p_new["text"],
                "ja",
            )
        )
    for i in range(N, N + n_new):  # brand-new urls
        p = synth_page(i)
        rows.append((p["url"], p["warc_ts"], p["html"], p["text"], "ja"))
    return rows


def test_detect_changes(spark, idx):
    base = synth_pages_df(spark, N, partitions=4)
    changed, tomb = detect_changes(spark, idx, base)
    # Re-submitting identical pages → nothing changed, no tombstones.
    assert changed.count() == 0
    assert tomb.count() == 0

    mod = spark.createDataFrame(_modified_pages(spark), PAGES_SCHEMA)
    changed2, tomb2 = detect_changes(spark, idx, mod)
    assert changed2.count() == 5  # 3 modified + 2 new
    assert tomb2.count() == 3  # old versions of the 3 modified urls


def test_incremental_update_and_tombstones(spark, idx):
    mod = spark.createDataFrame(_modified_pages(spark), PAGES_SCHEMA)
    row = incremental_update(spark, idx, mod, now=NOW)
    assert row is not None and row["docs"] == 5
    tombs = load_tombstones(spark, idx)
    assert len(tombs) == 3

    # Searcher must not return tombstoned docs.
    s = IndexSearcher(spark, idx, mode="myaku")
    top_term = (
        spark.read.parquet(f"{idx}/term_stats")
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df"))
        .limit(1)
        .collect()[0]
        .term
    )
    hits = s.search([top_term], k=50)
    assert all(d not in tombs for _, d in hits)
    # WAND still equals exhaustive under tombstones.
    assert hits == s.search([top_term], k=50, exhaustive=True)

    # Idempotence: same delta again → no further change.
    assert incremental_update(spark, idx, mod, now=NOW) is None


def test_reverted_content_reindexed(spark, tmp_path):
    # A url whose content reverts to a previously-indexed (now
    # tombstoned) text_hash must be RE-indexed, not skipped — otherwise
    # the old tombstone masks it forever and the page becomes
    # unsearchable (replace-on-write parity, database.py:396-434).
    d = str(tmp_path / "revidx")
    pages = synth_pages_df(spark, 10, partitions=2)
    build_index(spark, pages, d, n_groups=1, now=NOW)
    p0, pX = synth_page(0), synth_page(7000)
    mod = spark.createDataFrame(
        [(p0["url"], dt.datetime(2026, 2, 1), pX["html"], pX["text"], "ja")],
        PAGES_SCHEMA,
    )
    assert incremental_update(spark, d, mod, now=NOW)["docs"] == 1
    # Revert to the ORIGINAL content.
    rev = spark.createDataFrame(
        [(p0["url"], dt.datetime(2026, 3, 1), p0["html"], p0["text"], "ja")],
        PAGES_SCHEMA,
    )
    changed, tomb = detect_changes(spark, d, rev)
    assert changed.count() == 1  # NOT classified 'unchanged'
    row = incremental_update(spark, d, rev, now=NOW)
    assert row is not None and row["docs"] == 1
    # The reverted doc is live: exactly one non-tombstoned docs row for
    # the url, carrying the original text_hash.
    tombs = load_tombstones(spark, d)
    live = [
        r
        for r in spark.read.parquet(f"{d}/docs")
        .filter(F.col("url") == p0["url"])
        .collect()
        if r.doc_id not in tombs
    ]
    assert len(live) == 1


def test_dbwide_content_dedup_on_detect(spark, idx):
    # A NEW url whose text equals an existing live url's text is skipped
    # (first-writer-wins across the whole corpus, can_store_article
    # semantics, index_build.py:116-143).
    p3 = synth_page(3)  # content already indexed under its own url
    dup = spark.createDataFrame(
        [("https://synth.example.jp/copycat", dt.datetime(2026, 2, 1),
          p3["html"], p3["text"], "ja")],
        PAGES_SCHEMA,
    )
    changed, tomb = detect_changes(spark, idx, dup)
    assert changed.count() == 0
    assert tomb.count() == 0


def test_corpus_stats_exclude_tombstones(spark, tmp_path):
    d = str(tmp_path / "csidx")
    pages = synth_pages_df(spark, 12, partitions=2)
    build_index(spark, pages, d, n_groups=1, now=NOW)
    p1, pY = synth_page(1), synth_page(8000)
    mod = spark.createDataFrame(
        [(p1["url"], dt.datetime(2026, 2, 1), pY["html"], pY["text"], "ja")],
        PAGES_SCHEMA,
    )
    incremental_update(spark, d, mod, now=NOW)
    stats = spark.read.parquet(f"{d}/corpus_stats").collect()[0]
    tombs = load_tombstones(spark, d)
    docs = spark.read.parquet(f"{d}/docs").collect()
    live = [r for r in docs if r.doc_id not in tombs]
    # n_docs counts only live docs (12, not 13); avgdl over live dl.
    assert int(stats.n_docs) == len(live) == 12
    expect_avgdl = sum(r.dl for r in live) / len(live)
    assert abs(float(stats.avgdl) - expect_avgdl) < 1e-9


def test_search_and_missing_term_returns_empty(spark, idx):
    # Conjunctive search with a term absent from the index returns [] —
    # never intersects only the present terms (ADVICE round 1).
    s = IndexSearcher(spark, idx, mode="myaku")
    top_term = (
        spark.read.parquet(f"{idx}/term_stats")
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df"))
        .limit(1)
        .collect()[0]
        .term
    )
    assert s.search([top_term], k=5)  # sanity: present alone → hits
    assert s.search([top_term, "zz未知語zz"], k=5, combine="and") == []


def test_rescore_membership_guard(spark, tmp_path):
    # Rescoring a group whose membership changed since the build must
    # refuse (id reassignment would shift ids under existing tombstones).
    d = str(tmp_path / "gidx")
    pages = synth_pages_df(spark, 10, partitions=2)
    build_index(spark, pages, d, n_groups=1, now="2026-01-01 12:00:00")
    p0, pZ = synth_page(0), synth_page(9000)
    mutated = pages.unionByName(
        spark.createDataFrame(
            [("https://synth.example.jp/new-url", dt.datetime(2026, 2, 1),
              pZ["html"], pZ["text"], "ja")],
            PAGES_SCHEMA,
        )
    )
    with pytest.raises(ValueError, match="membership changed"):
        rescore_index(spark, d, mutated, "2026-07-20 12:00:00")


def test_docs_needing_rescore(spark):
    rows = [
        (1, dt.datetime(2026, 7, 26)),  # 6d old → crosses 7d boundary
        (2, dt.datetime(2026, 7, 1)),  # 31d old → stays in 31..90 bucket
        (3, dt.datetime(2020, 1, 1)),  # years old → stays in tail bucket
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "doc_ts"])
    out = docs_needing_rescore(docs, "2026-08-01 00:00:00", "2026-08-05 00:00:00")
    ids = {r.doc_id for r in out.collect()}
    assert 1 in ids  # 6d → 10d crosses the 7-day tier
    assert 3 not in ids


def test_rescore_rebuilds_affected_groups(spark, tmp_path):
    d = str(tmp_path / "ridx")
    pages = synth_pages_df(spark, 40, partitions=4)
    build_index(spark, pages, d, n_groups=2, now="2026-01-01 12:00:00")
    docs_before = {
        r.doc_id: r.doc_score
        for r in spark.read.parquet(f"{d}/docs").collect()
    }
    # synth warc_ts ≈ 2026-01-01 + minutes → moving 'now' by 200 days
    # crosses several recency tiers for all docs.
    groups = rescore_index(spark, d, pages, "2026-07-20 12:00:00")
    assert groups  # at least one group rebuilt
    docs_after = {
        r.doc_id: r.doc_score
        for r in spark.read.parquet(f"{d}/docs").collect()
    }
    assert set(docs_before) == set(docs_after)
    changed = [k for k in docs_before if docs_before[k] != docs_after[k]]
    assert changed  # recency factor moved → scores changed
    meta = spark.read.parquet(f"{d}/build_meta").collect()[0]
    assert meta.now == "2026-07-20 12:00:00"
