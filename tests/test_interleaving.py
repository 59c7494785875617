"""Adversarial maintenance-interleaving property test (r3 verdict #8).

Random schedules of incremental_update / compact_index / rescore_index
against a live index, with the invariant checked after every schedule:
search over the maintained index is indistinguishable from a
FROM-SCRATCH rebuild of the currently-live pages at the current 'now' —
per-url doc scores identical, and top-k by (score, url) identical for
the corpus's highest-df terms. This generalizes the round-2
compact-then-incremental data-loss regression test to arbitrary
op interleavings.

Comparison is by (url, score), not doc_id: id assignment order
legitimately differs between an incrementally-grown index and a fresh
rebuild, and the rank key's doc-id tiebreak with it."""

import datetime as dt
import random
import shutil

import pytest
from pyspark.sql import functions as F

from myaku_spark.operators.search import IndexSearcher
from myaku_spark.plans import catalog
from myaku_spark.plans.build_index import build_index
from myaku_spark.plans.compact import compact_index
from myaku_spark.plans.incremental import incremental_update, rescore_index
from myaku_spark.sources.pages import PAGES_SCHEMA, synth_page

N_SCHEDULES = 20
OPS_PER_SCHEDULE = 3
N_BASE = 10

NOWS = [f"2026-0{m}-0{d} 12:00:00" for m in range(1, 9) for d in (1, 8)]


def _page_row(url_i: int, content_i: int):
    """A page at url of page url_i carrying synth_page(content_i) text."""
    u = synth_page(url_i)
    c = synth_page(content_i)
    return (u["url"], dt.datetime(2026, 1, 1 + url_i % 20), c["html"],
            c["text"], "ja")


def _pages_df(spark, live: dict):
    return spark.createDataFrame(
        [_page_row(u, c) for u, c in sorted(live.items())], PAGES_SCHEMA
    )


def _score_map(spark, index_dir):
    docs = spark.read.parquet(catalog.path_of(index_dir, "docs"))
    from myaku_spark.plans.incremental import load_tombstones

    tombs = load_tombstones(spark, index_dir)
    rows = docs.select("doc_id", "url", "doc_score").collect()
    return {
        r.url: int(r.doc_score) for r in rows if int(r.doc_id) not in tombs
    }


def _topk_by_url(spark, index_dir, term, k=30):
    s = IndexSearcher(spark, index_dir, mode="myaku")
    hits = s.search([term], k=k)
    docs = {
        r.doc_id: r.url
        for r in spark.read.parquet(catalog.path_of(index_dir, "docs"))
        .select("doc_id", "url").collect()
    }
    out = sorted(((int(sc), docs[d]) for sc, d in hits), key=lambda t: (-t[0], t[1]))
    assert hits == s.search([term], k=k, exhaustive=True)
    return out


def _run_schedule(spark, tmp_path, seed):
    rng = random.Random(1000 + seed)
    d = str(tmp_path / f"ilv{seed}")
    live = {i: i for i in range(N_BASE)}  # url index → content index
    next_url = N_BASE
    next_content = 5000
    now_i = 0
    build_index(spark, _pages_df(spark, live), d, n_groups=2, now=NOWS[now_i])

    for _ in range(OPS_PER_SCHEDULE):
        op = rng.choice(["incr", "incr", "compact", "rescore"])
        if op == "incr":
            mods = {}
            for u in rng.sample(sorted(live), rng.randint(1, 2)):
                mods[u] = next_content  # changed content at existing url
                next_content += 1
            for _ in range(rng.randint(0, 2)):
                mods[next_url] = next_url  # brand-new url
                next_url += 1
            live.update(mods)
            incremental_update(
                spark, d, _pages_df(spark, mods), now=NOWS[now_i]
            )
        elif op == "compact":
            compact_index(spark, d)
        else:
            now_i = min(now_i + rng.randint(1, 3), len(NOWS) - 1)
            rescore_index(spark, d, NOWS[now_i])

    ref = str(tmp_path / f"ref{seed}")
    build_index(spark, _pages_df(spark, live), ref, n_groups=1,
                now=NOWS[now_i])
    assert _score_map(spark, d) == _score_map(spark, ref)

    terms = [
        r.term
        for r in spark.read.parquet(catalog.path_of(d, "term_stats"))
        .groupBy("term").agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df"), "term").limit(2).collect()
    ]
    for term in terms:
        assert _topk_by_url(spark, d, term) == _topk_by_url(
            spark, ref, term
        ), (seed, term)
    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(ref, ignore_errors=True)


def test_interleaved_maintenance_equals_fresh_rebuild(spark, tmp_path):
    # All schedules are independent (own index dirs, own RNG); they run
    # on driver threads so the local[32] scheduler overlaps their many
    # tiny jobs — the wall-clock of the slowest few schedules, not the
    # sum of all 20.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as ex:
        futures = {
            seed: ex.submit(_run_schedule, spark, tmp_path, seed)
            for seed in range(N_SCHEDULES)
        }
        for seed, fut in futures.items():
            fut.result()  # re-raises the schedule's assertion, if any
