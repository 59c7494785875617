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
