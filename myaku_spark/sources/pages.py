"""The ``pages`` input table and its deterministic synthesis.

Shape mandated by the driver input_hint (and FIXTURES.md §1):
    pages(url string, warc_ts timestamp, html binary, text string,
          lang string)

On a real deployment this is an Iceberg table
(``spark.read.format("iceberg").load("db.pages")``; incremental builds
read snapshot ranges). Iceberg's runtime jar is not available in this
sandbox, so ``read_pages``/``write_pages`` fall back to parquet with an
identical schema; every downstream operator is format-agnostic.

Synthesis is fully deterministic (seeded counter-based PRNG — no
wall-clock, no global random state): sentences are drawn from the
public-domain 桜の森の満開の下 corpus used by the reference's own tests
(/root/reference/myaku/sample_text.py) and wrapped in Kakuyomu-style
episode HTML (matching myaku/tests/end_to_end/test_html/kakuyomu/*) so
the extraction UDF must do real work, and the expected ``text`` column
is produced by construction for byte-identical verification.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import html as html_mod
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

_SAMPLE_PATH = "/root/reference/myaku/sample_text.py"
_BASE_TS = dt.datetime(2026, 1, 1, 0, 0, 0)


def _load_sample_sentences() -> list[str]:
    """Public-domain Japanese sentences from the reference sample corpus."""
    src = open(_SAMPLE_PATH, encoding="utf-8").read()
    m = re.search(r'SAMPLE_TEXT = """(.*?)"""', src, re.S)
    text = m.group(1)
    sents = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        for s in re.split(r"(?<=[。？！])", line):
            s = s.strip("　")
            if len(s) >= 8:
                sents.append(s)
    return sents


_SENTENCES: list[str] | None = None


def _sentences() -> list[str]:
    global _SENTENCES
    if _SENTENCES is None:
        _SENTENCES = _load_sample_sentences()
    return _SENTENCES


def _prng(i: int, j: int) -> int:
    """Counter-based deterministic PRNG (no global state)."""
    h = hashlib.blake2b(
        f"{i}:{j}".encode(), digest_size=8, key=b"myaku_spark"
    ).digest()
    return int.from_bytes(h, "little")


def synth_page(i: int, paras_min: int = 2, paras_max: int = 6) -> dict:
    """One deterministic Kakuyomu-style page (url, warc_ts, html, text)."""
    sents = _sentences()
    n_paras = paras_min + _prng(i, 0) % (paras_max - paras_min + 1)
    title = f"Synth Series {i % 97} Episode {i}"
    paras = []
    for p in range(n_paras):
        n_s = 1 + _prng(i, 100 + p) % 4
        para = "".join(
            sents[_prng(i, 1000 + p * 10 + k) % len(sents)] for k in range(n_s)
        )
        paras.append("　" + para)
    # Expected extraction output (kakuyomu.py:656-685 assembly).
    text = "\n".join([title.strip(), ""] + paras)
    body_html = "\n".join(
        f'<p id="p{k+1}">{html_mod.escape(p, quote=False)}</p>'
        for k, p in enumerate(paras)
    )
    page_html = (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        '<meta charset="utf-8">\n'
        f"<title>{html_mod.escape(title, quote=False)}</title>\n"
        "</head>\n<body>\n"
        '<div id="contentMain" role="main">\n'
        "<header>\n"
        f'<p class="widget-episodeTitle">{html_mod.escape(title, quote=False)}</p>\n'
        "</header>\n"
        '<div class="widget-episode">\n'
        f'<div class="widget-episodeBody js-episode-body">\n{body_html}\n</div>\n'
        "</div>\n</div>\n</body>\n</html>\n"
    )
    ts = _BASE_TS + dt.timedelta(minutes=i % 100_000)
    return {
        "url": f"https://synth.example.jp/series-{i % 97}/episode-{i}",
        "warc_ts": ts,
        "html": page_html.encode("utf-8"),
        "text": text,
        "lang": "ja",
    }


def synth_pages_df(
    spark: SparkSession,
    n: int,
    partitions: int | None = None,
    paras: tuple[int, int] = (2, 6),
) -> DataFrame:
    """Deterministic pages table of n rows, generated in parallel.

    Generation happens executor-side via mapInPandas over an id range, so
    a 10^12-row table is just a bigger range — no driver materialization.
    ``paras`` sets the per-page paragraph count range; (10, 30) yields
    ~2-3 KB of text per page (Common-Crawl-like), the default (2, 6)
    keeps unit tests fast.
    """
    import pandas as pd

    parts = partitions or max(8, n // 5000)
    base = spark.range(0, n, 1, parts)
    lo, hi = paras

    def gen(batches):
        for pdf in batches:
            rows = [synth_page(int(i), lo, hi) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, PAGES_SCHEMA)


def golden_pages_df(spark: SparkSession) -> DataFrame:
    """pages table built from the reference golden fixtures (tests)."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from golden import golden_pages  # noqa: PLC0415

    rows = [
        (
            p["url"],
            _BASE_TS,
            p["html"],
            p["full_text"],
            "ja",
        )
        for p in golden_pages("initial")
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Landing-zone reader for every format a crawl might deliver.

    parquet/orc keep their native types; json/csv are schema-enforced
    against PAGES_SCHEMA with the binary ``html`` column carried
    base64 (text formats cannot hold raw bytes) and decoded on read, so
    downstream extraction sees identical bytes regardless of format."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    if fmt == "avro":
        # external-but-bundled module in real distributions; the jar is
        # absent in this sandbox (gated test, like iceberg)
        return spark.read.format("avro").load(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt in ("json", "csv"):
        text_schema = (
            "url string, warc_ts timestamp, html string,"
            " text string, lang string"
        )
        reader = spark.read.schema(text_schema)
        if fmt == "csv":
            df = reader.option("header", True).option(
                "multiLine", True
            ).option(
                "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
            ).csv(path)
        else:
            df = reader.option(
                "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
            ).json(path)
        return df.select(
            "url", "warc_ts",
            F.unbase64("html").alias("html"),
            "text", "lang",
        )
    raise ValueError(f"unsupported pages format: {fmt}")


def write_pages(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    if fmt == "iceberg":
        df.writeTo(path).createOrReplace()
    elif fmt == "avro":
        df.write.mode("overwrite").format("avro").save(path)
    elif fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif fmt == "orc":
        df.write.mode("overwrite").orc(path)
    elif fmt in ("json", "csv"):
        out = df.select(
            "url",
            # microsecond precision — parquet timestamps are micros and
            # the round-trip must not truncate; both sides assume one
            # session timezone (write and read under the same
            # spark.sql.session.timeZone, UTC in this repo's sessions)
            F.date_format(
                "warc_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
            ).alias("warc_ts"),
            F.base64("html").alias("html"),
            "text", "lang",
        )
        if fmt == "csv":
            out.write.mode("overwrite").option("header", True).csv(path)
        else:
            out.write.mode("overwrite").json(path)
    else:
        raise ValueError(f"unsupported pages format: {fmt}")
