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
