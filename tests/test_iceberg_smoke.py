"""Gated Iceberg-real smoke test (round-4 verdict item 8).

The catalog model (`myaku_spark/plans/catalog.py`) and `read_pages`
(`myaku_spark/sources/pages.py:184`) are Iceberg-shaped but emulated
over parquet because no iceberg-spark-runtime jar ships in this
sandbox.  This test keeps that emulation honest: when a jar IS
available (vendored into pyspark's jars dir, $SPARK_HOME/jars, the
ivy cache, or pointed at via $ICEBERG_SPARK_JAR) it exercises the
real runtime end-to-end —

  write_pages(fmt="iceberg")  -> real Iceberg table (hadoop catalog)
  read_pages(fmt="iceberg")   -> round-trip equality
  append + snapshot listing    -> two snapshots recorded
  incremental snapshot-range read (start-snapshot-id/end-snapshot-id)
                               -> exactly the appended delta

and is skipped (not passed) otherwise.  Iceberg extensions and
catalog jars must be on the JVM classpath at session start, so the
smoke body runs in a fresh subprocess interpreter rather than the
shared test session.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import tempfile
import textwrap

import pytest


def _find_iceberg_jar() -> str | None:
    env = os.environ.get("ICEBERG_SPARK_JAR")
    if env and os.path.isfile(env):
        return env
    candidates: list[str] = []
    try:
        import pyspark

        candidates.append(
            os.path.join(os.path.dirname(pyspark.__file__), "jars")
        )
    except ImportError:  # pragma: no cover
        pass
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        candidates.append(os.path.join(spark_home, "jars"))
    candidates.append(os.path.expanduser("~/.ivy2/jars"))
    candidates.append(os.path.expanduser("~/.ivy2.5.2/jars"))
    for d in candidates:
        hits = sorted(glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar")))
        if hits:
            return hits[-1]
    return None


_SMOKE_BODY = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    jar, warehouse = sys.argv[1], sys.argv[2]
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg_smoke")
        .config("spark.jars", jar)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions",
        )
        .config(
            "spark.sql.catalog.local",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from myaku_spark.sources.pages import (
        read_pages, synth_pages_df, write_pages,
    )

    table = "local.db.pages_smoke"
    first = synth_pages_df(spark, n=20).cache()
    write_pages(first, table, fmt="iceberg")
    back = read_pages(spark, table, fmt="iceberg")
    assert back.count() == 20
    assert sorted(back.columns) == sorted(first.columns)

    # synth_pages_df is deterministic in the row id, so rows 20..26 of
    # the 27-row table are a disjoint delta from the first batch.
    delta = (
        synth_pages_df(spark, n=27)
        .join(first.select("url"), "url", "left_anti")
        .cache()
    )
    assert delta.count() == 7
    delta.writeTo(table).append()

    snaps = [
        r.snapshot_id
        for r in spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots"
            " ORDER BY committed_at"
        ).collect()
    ]
    assert len(snaps) == 2, snaps

    inc = (
        spark.read.format("iceberg")
        .option("start-snapshot-id", str(snaps[0]))
        .option("end-snapshot-id", str(snaps[1]))
        .load(table)
    )
    inc_urls = {r.url for r in inc.select("url").collect()}
    delta_urls = {r.url for r in delta.select("url").collect()}
    assert inc_urls == delta_urls, (len(inc_urls), len(delta_urls))
    print(json.dumps({"ok": True, "snapshots": len(snaps)}))
    """
)


@pytest.mark.skipif(
    _find_iceberg_jar() is None,
    reason="no iceberg-spark-runtime jar on this box "
    "(vendor one or set ICEBERG_SPARK_JAR to run the real-runtime smoke)",
)
def test_iceberg_roundtrip_and_snapshot_range():
    jar = _find_iceberg_jar()
    with tempfile.TemporaryDirectory() as tmp:
        script = os.path.join(tmp, "smoke.py")
        with open(script, "w") as f:
            f.write(_SMOKE_BODY)
        proc = subprocess.run(
            [sys.executable, script, jar, os.path.join(tmp, "wh")],
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        assert '"ok": true' in proc.stdout
