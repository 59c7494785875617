"""Fuzzy term lookup: lossless prune, ranking, short-string legs."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from myaku_spark.operators.fuzzy import fuzzy_term_lookup


def _terms_df(spark, rows):
    return spark.createDataFrame(rows, "term string, df long")


def _queries_df(spark, rows):
    return spark.createDataFrame(rows, "query_id string, q string")


def _collect(df):
    return sorted(
        (r.query_id, r.q, r.term, r.dist, r.df) for r in df.collect()
    )


def test_basic_suggestions(spark):
    terms = _terms_df(
        spark,
        [("window", 400), ("widow", 30), ("meadow", 25), ("stream", 390)],
    )
    queries = _queries_df(spark, [("q1", "windoe")])
    got = _collect(fuzzy_term_lookup(terms, queries, max_dist=2, k=5))
    # window: dist 1 (w->e sub), widow: dist 2, meadow: 4, stream: far
    assert got == [
        ("q1", "windoe", "widow", 2, 30),
        ("q1", "windoe", "window", 1, 400),
    ]


def test_ranking_dist_then_df_then_term(spark):
    terms = _terms_df(
        spark, [("cat", 10), ("cart", 99), ("bat", 10), ("car", 50)]
    )
    queries = _queries_df(spark, [("q1", "cat")])
    rows = fuzzy_term_lookup(terms, queries, max_dist=1, k=3).collect()
    ordered = sorted(rows, key=lambda r: (r.dist, -r.df, r.term))
    assert [r.term for r in ordered] == ["cat", "cart", "car"]
    assert [r.dist for r in ordered] == [0, 1, 1]


def test_short_strings_found_despite_vacuous_gram_bound(spark):
    # len <= q-1+q*d = 5: zero shared bigrams is possible within dist 2.
    terms = _terms_df(spark, [("ab", 1), ("cd", 2), ("a", 3)])
    queries = _queries_df(spark, [("q1", "ef"), ("q2", "b")])
    got = _collect(fuzzy_term_lookup(terms, queries, max_dist=2, k=10))
    # every term is within 2 edits of every len<=2 query here
    assert ("q1", "ef", "ab", 2, 1) in got
    assert ("q1", "ef", "cd", 2, 2) in got
    assert ("q2", "b", "ab", 1, 1) in got
    assert ("q2", "b", "a", 1, 3) in got


@pytest.mark.parametrize("max_dist", [1, 2])
def test_pruned_equals_brute_force(spark, max_dist):
    # Deterministic corpus over a tiny alphabet: maximal gram collisions
    # and plenty of boundary lengths around the short-leg cutoff.
    alpha = "abc"
    terms = []
    i = 0
    for ln in (1, 2, 3, 4, 5, 6, 7):
        for tup in itertools.islice(
            itertools.product(alpha, repeat=ln), 0, 27, 3
        ):
            terms.append(("".join(tup), i % 7 + 1))
            i += 1
    queries = [
        (f"q{j}", w)
        for j, w in enumerate(
            ["a", "ab", "abc", "cab", "abab", "cbacb", "aabbcc", "bcabca"]
        )
    ]
    tdf = _terms_df(spark, terms)
    qdf = _queries_df(spark, queries)
    # k large enough that top-k never truncates differently
    k = len(terms) + 1
    pruned = _collect(
        fuzzy_term_lookup(tdf, qdf, max_dist=max_dist, k=k, prune=True)
    )
    brute = _collect(
        fuzzy_term_lookup(tdf, qdf, max_dist=max_dist, k=k, prune=False)
    )
    assert pruned == brute
    assert len(brute) > 0


def test_no_match_yields_empty(spark):
    terms = _terms_df(spark, [("elephant", 5)])
    queries = _queries_df(spark, [("q1", "xy")])
    assert (
        fuzzy_term_lookup(terms, queries, max_dist=2, k=3).count() == 0
    )


def test_prefix_lookup_paths_identical_and_pushdown(spark, tmp_path):
    from myaku_spark.operators.fuzzy import prefix_term_lookup

    terms = spark.createDataFrame(
        [
            ("alpha", 30), ("alphabet", 10), ("alpine", 20),
            ("beta", 40), ("between", 5), ("al", 7), ("gamma", 1),
        ],
        "term string, df long",
    )
    qs = [("p1", "al"), ("p2", "be"), ("p3", "zz")]
    qdf = spark.createDataFrame(qs, "query_id string, prefix string")

    def key(rows):
        return sorted(
            (r.query_id, r.prefix, r.rank, r.term, r.df) for r in rows
        )

    got_list = key(prefix_term_lookup(terms, qs, k=2).collect())
    got_df = key(prefix_term_lookup(terms, qdf, k=2).collect())
    assert got_list == got_df
    # rank by df desc then term; 'zz' contributes nothing
    assert got_list == [
        ("p1", "al", 1, "alpha", 30),
        ("p1", "al", 2, "alpine", 20),
        ("p2", "be", 1, "beta", 40),
        ("p2", "be", 2, "between", 5),
    ]

    # literal-path pushdown: a parquet-persisted dictionary shows the
    # prefix probe in PushedFilters (row-group pruning at scale)
    p = str(tmp_path / "term_dict")
    terms.sort("term").write.parquet(p)
    disk = spark.read.parquet(p)
    plan = (
        prefix_term_lookup(disk, [("p1", "al")], k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "StartsWith" in plan, plan
