"""First-page cache materialization + refresh decision, compaction, and
physical-plan pruning assertions."""

import pytest
from pyspark.sql import functions as F

from myaku_spark.operators.topk_cache import (
    build_first_page,
    refresh_first_page,
    stale_terms,
)


@pytest.fixture(scope="module")
def scored(spark):
    rows = []
    # term 'hot': 15 docs, scores 100..1500; term 'cold': 3 docs.
    for d in range(15):
        rows.append(("hot", d, (d + 1) * 100))
    for d in range(3):
        rows.append(("cold", d + 100, 50 + d))
    return spark.createDataFrame(rows, ["term", "doc_id", "score"])


def test_build_first_page(spark, scored):
    page = build_first_page(scored, k=10)
    rows = [r for r in page.collect() if r.term == "hot"]
    assert len(rows) == 10
    assert all(r.total_results == 15 for r in rows)
    best = min(rows, key=lambda r: r.rank)
    assert best.doc_id == 14 and best.score == 1500
    # floor of the page = rank 10 → score 600
    floor = max(rows, key=lambda r: r.rank)
    assert floor.score == 600


def test_stale_terms_decision(spark, scored):
    cached = build_first_page(scored, k=10)
    # Delta 1: a posting below the hot page floor → NOT stale.
    low = spark.createDataFrame([("hot", 999, 10)], ["term", "doc_id", "score"])
    assert stale_terms(cached, low, k=10).count() == 0
    # Delta 2: outranks the floor → stale.
    high = spark.createDataFrame(
        [("hot", 999, 700)], ["term", "doc_id", "score"]
    )
    assert [r.term for r in stale_terms(cached, high, k=10).collect()] == ["hot"]
    # Delta 3: 'cold' page is not full → any posting marks it stale.
    coldd = spark.createDataFrame(
        [("cold", 999, 1)], ["term", "doc_id", "score"]
    )
    assert [r.term for r in stale_terms(cached, coldd, k=10).collect()] == [
        "cold"
    ]
    # Delta 4: unseen term → stale (needs caching).
    new = spark.createDataFrame([("new", 1, 5)], ["term", "doc_id", "score"])
    assert [r.term for r in stale_terms(cached, new, k=10).collect()] == ["new"]


def test_refresh_first_page(spark, scored):
    cached = build_first_page(scored, k=10)
    delta = spark.createDataFrame(
        [("hot", 999, 700)], ["term", "doc_id", "score"]
    )
    all_postings = scored.unionByName(delta)
    refreshed = refresh_first_page(cached, all_postings, delta, k=10)
    hot = sorted(
        (r.rank, r.doc_id) for r in refreshed.collect() if r.term == "hot"
    )
    assert (9, 999) in hot  # the new doc entered at score 700
    assert len(hot) == 10
    cold = [r for r in refreshed.collect() if r.term == "cold"]
    assert len(cold) == 3  # untouched term kept verbatim


def test_compact_merges_and_applies_tombstones(spark, tmp_path):
    from myaku_spark.operators.search import IndexSearcher
    from myaku_spark.plans.build_index import build_index
    from myaku_spark.plans.compact import compact_index
    from myaku_spark.plans.incremental import incremental_update
    from myaku_spark.sources.pages import PAGES_SCHEMA, synth_page, synth_pages_df

    import datetime as dt

    d = str(tmp_path / "cidx")
    pages = synth_pages_df(spark, 40, partitions=4)
    build_index(spark, pages, d, n_groups=1, now="2026-08-01 00:00:00")

    # Modify 2 urls (new html) → delta group + 2 tombstones.
    rows = []
    for i in range(2):
        p_old, p_new = synth_page(i), synth_page(i + 7000)
        rows.append(
            (p_old["url"], dt.datetime(2026, 3, 1), p_new["html"], p_new["text"], "ja")
        )
    mod = spark.createDataFrame(rows, PAGES_SCHEMA)
    incremental_update(spark, d, mod, now="2026-08-01 00:00:00")

    s_before = IndexSearcher(spark, d, mode="myaku")
    term = (
        spark.read.parquet(f"{d}/term_stats")
        .groupBy("term").agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df")).limit(1).collect()[0].term
    )
    before = s_before.search([term], k=30)

    out = compact_index(spark, d)
    assert out["tombstones_applied"] == 2
    s_after = IndexSearcher(spark, d, mode="myaku")
    assert s_after.deleted is None  # tombstones cleared
    after = s_after.search([term], k=30)
    assert after == before  # same results, now without delete vectors
    # Doc table (resolved via the catalog pointer) no longer contains
    # tombstoned ids.
    from myaku_spark.plans import catalog

    n_docs = spark.read.parquet(catalog.path_of(d, "docs")).count()
    assert n_docs == out["n_docs"]
    assert catalog.current(d)["version"] == 1

    # Snapshot isolation: a searcher constructed BEFORE a compaction
    # keeps serving its resolved version even while a second compaction
    # publishes (and GCs versions older than its predecessor).
    s_mid = IndexSearcher(spark, d, mode="myaku")  # resolves v1
    out2 = compact_index(spark, d)  # publishes v2, GC keeps {v1, v2}
    assert out2["version"] == 2
    assert s_mid.search([term], k=30) == before  # v1 still readable
    s_new = IndexSearcher(spark, d, mode="myaku")  # resolves v2
    assert s_new.search([term], k=30) == before


def test_segment_read_partition_pruning(spark, tmp_path):
    """The term-segment read must prune on the bucket partition column and
    push the term predicate to parquet (.explain evidence)."""
    from myaku_spark.operators.segments import read_term_segments
    from myaku_spark.plans.build_index import build_index
    from myaku_spark.sources.pages import synth_pages_df

    d = str(tmp_path / "pidx")
    build_index(
        spark,
        synth_pages_df(spark, 30, partitions=2),
        d,
        n_groups=1,
        now="2026-08-01 00:00:00",
    )
    term = (
        spark.read.parquet(f"{d}/term_stats").limit(1).collect()[0].term
    )
    df = read_term_segments(spark, f"{d}/segments", [term])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "bucket" in plan
    assert "PushedFilters" in plan and "term" in plan


def test_catalog_time_travel(spark, tmp_path):
    # Iceberg-style read-at-snapshot: a searcher pinned to a past
    # version serves the index exactly as published then, while the
    # live pointer advances; GC'd snapshots fail loudly.
    import pytest as _pytest

    from myaku_spark.operators.search import IndexSearcher
    from myaku_spark.plans import catalog
    from myaku_spark.plans.build_index import build_index
    from myaku_spark.plans.incremental import rescore_index
    from myaku_spark.sources.pages import synth_pages_df

    d = str(tmp_path / "tt")
    build_index(
        spark, synth_pages_df(spark, 30, partitions=2), d,
        n_groups=1, now="2026-01-01 12:00:00",
    )
    term = (
        spark.read.parquet(catalog.path_of(d, "term_stats"))
        .orderBy(F.desc("df"), "term").limit(1).collect()[0].term
    )
    v0_hits = IndexSearcher(spark, d, mode="myaku").search([term], k=20)

    rescore_index(spark, d, "2026-07-20 12:00:00")  # v1: new scores
    assert catalog.versions(d) == [1, 0]
    live = IndexSearcher(spark, d, mode="myaku").search([term], k=20)
    pinned = IndexSearcher(spark, d, mode="myaku", version=0).search(
        [term], k=20
    )
    assert pinned == v0_hits
    assert {d_ for _, d_ in live} == {d_ for _, d_ in pinned}
    assert live != pinned  # recency tiers moved every doc's score

    with _pytest.raises(KeyError):
        catalog.at_version(d, 7)

    # Two more snapshots — 'now' jumps that cross the 365/1095-day
    # recency tiers so every rescore touches docs and writes fresh
    # versioned dirs. GC keeps {current, previous} → v1's dirs go
    # (v0's legacy unversioned names are never GC'd by design).
    out2 = rescore_index(spark, d, "2027-02-01 12:00:00")
    out3 = rescore_index(spark, d, "2029-06-01 12:00:00")
    assert out2["n_affected"] > 0 and out3["n_affected"] > 0
    assert catalog.versions(d) == [3, 2, 1, 0]
    with _pytest.raises(FileNotFoundError):
        catalog.at_version(d, 1)
