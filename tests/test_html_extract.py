"""Extraction parity: byte-identical full_text + SHA-256 + alnum_count
vs the reference golden corpus (21 initial + update articles), through
both the pure-Python path and the Spark pandas-UDF path."""

import pytest

from myaku_spark.functions.html_extract import extract_text, extract_text_udf
from myaku_spark.functions.textfns import alnum_count_py, text_hash_py

from golden import golden_pages


@pytest.fixture(scope="module")
def pages():
    p = golden_pages("both")
    assert len(p) >= 20, "golden corpus should have >= 20 articles"
    return p


def test_extraction_byte_identical(pages):
    for p in pages:
        got = extract_text(p["html"], p["source"])
        assert got == p["full_text"], p["url"]


def test_extraction_sha256(pages):
    for p in pages:
        got = extract_text(p["html"], p["source"])
        assert text_hash_py(got) == p["text_hash"], p["url"]


def test_extraction_alnum_count(pages):
    for p in pages:
        got = extract_text(p["html"], p["source"])
        assert alnum_count_py(got) == p["alnum_count"], p["url"]


def test_unknown_source_returns_null():
    assert extract_text(b"<html></html>", "mystery") is None


def test_unparseable_returns_null():
    assert extract_text(b"<html><body>no structure</body></html>", "asahi") is None


def test_paywall_returns_null():
    html = (
        b'<html><body><div class="ArticleTitle">'
        b'<span class="TagMemberGold">member</span><h1>t</h1></div>'
        b'<div class="ArticleText"><p>body</p></div></body></html>'
    )
    assert extract_text(html, "asahi") is None


def test_extract_udf_matches_python(spark, pages):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(p["url"], p["html"], p["source"]) for p in pages],
        ["url", "html", "source"],
    )
    out = {
        r.url: r.text
        for r in df.select(
            "url", extract_text_udf(F.col("html"), F.col("source")).alias("text")
        ).collect()
    }
    for p in pages:
        assert out[p["url"]] == p["full_text"], p["url"]
