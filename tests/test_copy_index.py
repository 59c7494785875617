"""S9 index→index copy (plans/copy.py): dedup-skip, id-collision remap,
distributed posting FK remap — the reference's copy_db_data semantics
(database.py:34-128) over the segment layout."""

import pytest
from pyspark.sql import functions as F

from myaku_spark.operators.search import IndexSearcher
from myaku_spark.plans.build_index import build_index
from myaku_spark.plans.copy import copy_index

NOW = "2026-08-01 00:00:00"


def _pages_range(spark, lo, hi):
    from myaku_spark.sources.pages import PAGES_SCHEMA, synth_page

    rows = [
        tuple(synth_page(i)[k] for k in ("url", "warc_ts", "html", "text", "lang"))
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def test_copy_skip_collide_and_search(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_index(spark, _pages_range(spark, 0, 30), a, n_groups=1, now=NOW)
    build_index(spark, _pages_range(spark, 20, 40), b, n_groups=1, now=NOW)

    out = copy_index(spark, b, a)
    # 10 overlapping docs skipped; 10 new docs copied; their dense B ids
    # (10..19) all collide with A's (0..29).
    assert out["skipped"] == 10
    assert out["copied"] == 10
    assert out["collisions"] == 10

    from myaku_spark.plans import catalog

    docs = spark.read.parquet(catalog.path_of(a, "docs"))
    # No duplicate ids, no duplicate urls; 40 docs total.
    assert docs.count() == 40
    assert docs.select("doc_id").distinct().count() == 40
    assert docs.select("url").distinct().count() == 40
    # Remapped ids landed above the previous max.
    copied = docs.filter(F.col("doc_id") >= 30)
    assert copied.count() == 10
    # Corpus stats reflect the merged corpus.
    stats = spark.read.parquet(catalog.path_of(a, "corpus_stats")).collect()[0]
    assert int(stats.n_docs) == 40

    # Search over the merged index reaches copied docs; WAND == oracle.
    s = IndexSearcher(spark, a, mode="myaku")
    term = (
        spark.read.parquet(catalog.path_of(a, "term_stats"))
        .groupBy("term").agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df"), "term").limit(1).collect()[0].term
    )
    hits = s.search([term], k=40)
    assert hits == s.search([term], k=40, exhaustive=True)
    assert any(d >= 30 for _, d in hits)  # copied docs are searchable

    # Positions survived the re-key: previews recover real offsets.
    seg = spark.read.parquet(catalog.path_of(a, "segments"))
    grp = out["group"]
    assert seg.filter(F.col("group") == grp).count() > 0

    # Idempotence: a second copy finds everything already present.
    again = copy_index(spark, b, a)
    assert again["copied"] == 0 and again["skipped"] == 20

    # Compaction folds the copied group cleanly.
    from myaku_spark.plans.compact import compact_index

    before = s.search([term], k=40)
    compact_index(spark, a)
    s2 = IndexSearcher(spark, a, mode="myaku")
    assert s2.search([term], k=40) == before


def test_copy_mode_mismatch_raises(spark, tmp_path):
    a = str(tmp_path / "ma")
    b = str(tmp_path / "mb")
    build_index(spark, _pages_range(spark, 0, 6), a, n_groups=1, now=NOW)
    build_index(spark, _pages_range(spark, 0, 6), b, n_groups=1, now=NOW,
                mode="bm25")
    with pytest.raises(ValueError, match="mode mismatch"):
        copy_index(spark, b, a)
