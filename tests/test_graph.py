"""Link-graph ops: href extraction (stdlib DOM), degrees, PageRank."""

import pytest
from pyspark.sql import functions as F

from myaku_spark.operators.graph import (
    extract_links,
    in_degrees,
    out_degrees,
    pagerank,
)


def test_extract_links_dom_walk(spark):
    pages = spark.createDataFrame(
        [
            (
                "http://a.example/",
                """<html><body>
                <a href="http://b.example/x">b</a>
                <p>text <a href="/rel/path">rel</a></p>
                <a name="anchor-no-href">skip</a>
                <!-- <a href="http://comment.example/">never</a> -->
                </body></html>""",
            ),
            ("http://empty.example/", "<html><body>no links</body></html>"),
            ("http://null.example/", None),
        ],
        "url string, html string",
    )
    rows = extract_links(pages).collect()
    got = {(r.src, r.href) for r in rows}
    assert got == {
        ("http://a.example/", "http://b.example/x"),
        ("http://a.example/", "/rel/path"),
    }


def test_extract_links_binary_html(spark):
    # the pages table lands html as binary; bytes decode utf-8
    pages = spark.createDataFrame(
        [("u1", '<a href="http://x/">x</a>'.encode())],
        "url string, html binary",
    )
    assert [r.href for r in extract_links(pages).collect()] == ["http://x/"]


def test_degrees(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (3, 1)], "src long, dst long"
    )
    outd = {r.src: r.out_degree for r in out_degrees(edges).collect()}
    ind = {r.dst: r.in_degree for r in in_degrees(edges).collect()}
    assert outd == {1: 2, 2: 1, 3: 2}  # parallel edges count
    assert ind == {2: 1, 3: 2, 1: 2}


def _numpy_pagerank(edges, nodes, iters, damping=0.85):
    from collections import Counter, defaultdict

    n = len(nodes)
    outdeg = Counter(s for s, _ in edges)
    inc = defaultdict(list)
    for s, d in edges:
        inc[d].append(s)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        r = {
            v: (1 - damping) / n
            + damping * sum(r[u] / outdeg[u] for u in inc[v])
            for v in nodes
        }
    return r


@pytest.mark.parametrize("iters", [1, 3])
def test_pagerank_matches_python_twin(spark, iters):
    # small graph with a dangling node (4 has no outlinks: its mass
    # leaks — the documented simplification, twinned identically) and
    # an isolated node (5: teleport mass only)
    e = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4)]
    nodes = [1, 2, 3, 4, 5]
    edges = spark.createDataFrame(e, "src long, dst long")
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    got = {
        r.node: r.rank
        for r in pagerank(edges, nodes=ndf, n_iter=iters).collect()
    }
    want = _numpy_pagerank(e, nodes, iters)
    assert set(got) == set(want)
    for v in nodes:
        assert abs(got[v] - want[v]) < 1e-12, v
    # ranks form a probability-like vector minus the leaked mass
    assert 0 < sum(got.values()) <= 1.0 + 1e-9


def test_pagerank_default_nodes_and_empty(spark):
    edges = spark.createDataFrame([(7, 8)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(edges, n_iter=2).collect()}
    assert set(got) == {7, 8}
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, n_iter=2).count() == 0


def test_pagerank_iterations_read_cache_not_lineage(spark):
    # each iteration persists + materializes before the previous frame
    # unpersists, so consuming the result is ONE InMemoryTableScan with
    # no Join above it — iteration t+1 reads the cached t, it never
    # recomputes the whole lineage (the iterative-join blow-up guard;
    # the plan STRING still prints the cached child's history, which is
    # why this asserts the executed access path instead)
    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 10) for i in range(10)], "src long, dst long"
    )
    p4 = pagerank(edges, n_iter=4)
    phys = p4._jdf.queryExecution().executedPlan().toString()
    lines = phys.split("\n")
    above_scan = []
    for ln in lines:
        if "InMemoryTableScan" in ln:
            break
        above_scan.append(ln)
    assert any("InMemoryTableScan" in ln for ln in lines)
    assert not any("Join" in ln for ln in above_scan), above_scan
