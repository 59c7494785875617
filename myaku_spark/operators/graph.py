"""Link-graph analysis over a crawled corpus.

The reference's crawlers walk links live (myaku/crawlers/base.py —
follow-page loops over parsed hrefs); at archive scale the same
information is a *graph computation* over the landed pages: extract
the hrefs once, aggregate degrees, rank hosts/pages by link authority
(the crawl-frontier prioritization signal a 100 TB recrawl needs).

Scale shape:

- ``extract_links`` is projection-only (one pandas UDF pass over the
  html column — the same stdlib DOM the extraction pipeline uses);
  output is one row per (src, href), linear in corpus hyperlinks.
- ``out_degrees`` / ``in_degrees`` are single groupBy aggs with
  map-side combine.
- ``pagerank`` is the standard damped power iteration kept entirely
  in DataFrames: per-iteration cost is one equi-join (rank onto edge
  src) + one groupBy(dst) sum — both shuffle on the same key, so AQE
  reuses the exchange; no driver-side graph state at any size. Each
  iteration's ranks are persisted and the previous iteration
  unpersisted, so lineage stays O(1) deep instead of O(iters)
  (iterative-join plans otherwise grow exponentially under Catalyst's
  join reordering). Dangling nodes (no outlinks) follow the
  "redistribute-nothing" simplification: their mass leaks, matching
  the unrolled relational formulation exactly — fine for ranking use
  (relative order), documented for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_links(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(src, href) per <a href=...> in each page's html — executor-side
    stdlib DOM walk (functions/minidom.py, the extraction parser), no
    regex-over-html false positives. Relative hrefs are returned as-is;
    resolution policy belongs to the caller."""
    import pandas as pd

    def gen(it):
        from myaku_spark.functions.minidom import parse_html

        for pdf in it:
            srcs: list[str] = []
            hrefs: list[str] = []
            for u, h in zip(pdf[url_col], pdf[html_col]):
                if h is None:
                    continue
                raw = bytes(h) if not isinstance(h, str) else h
                try:
                    text = (
                        raw.decode("utf-8", "replace")
                        if isinstance(raw, (bytes, bytearray))
                        else raw
                    )
                    root = parse_html(text)
                except Exception:  # noqa: BLE001 — bad html = no links
                    continue
                for a in root.find_all("a"):
                    href = (a.attrs or {}).get("href")
                    if href:
                        srcs.append(u)
                        hrefs.append(href)
            yield pd.DataFrame({"src": srcs, "href": hrefs})

    return pages.select(url_col, html_col).mapInPandas(
        gen, "src string, href string"
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("out_degree")
    )


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("dst").agg(
        F.count(F.lit(1)).cast("long").alias("in_degree")
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    n_iter: int = 3,
    damping: float = 0.85,
    persist_every: int = 4,
) -> DataFrame:
    """(node, rank) after ``n_iter`` damped power iterations.

    ``edges``: (src, dst) rows (duplicates count as parallel edges —
    dedupe first if unwanted). ``nodes``: one ``node`` column giving
    the full vertex set (isolated vertices keep the teleport mass);
    defaults to the set of edge endpoints. One count() action fixes N;
    everything else is joins/aggs. r_{t+1}(v) = (1-d)/N +
    d * Σ_{(u,v)∈E} r_t(u)/outdeg(u).

    The returned frame IS the last iteration's persisted cache (that
    persist is what keeps lineage O(1) instead of O(iters) — dropping
    it would make any consumer recompute the whole unpersisted chain).
    Long-lived callers should ``.unpersist()`` it once consumed.

    ``persist_every`` (r7): intermediate iterations persist/materialize
    only every k-th round instead of every round — a materialize action
    per iteration cost one extra job + cache write for a lineage that
    Catalyst handles fine at small depths; the periodic cut still
    bounds plan growth for large ``n_iter``. The final iteration always
    persists (the consumer-access contract above).
    """
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
    nodes = nodes.select("node").persist()
    n = nodes.count()
    if n == 0:
        out = nodes.withColumn("rank", F.lit(0.0))
        nodes.unpersist()
        return out
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("outdeg")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    persisted = None  # the last materialized frame in the chain
    for it in range(int(n_iter)):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        new_ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        last = it == int(n_iter) - 1
        if last or (it + 1) % max(1, int(persist_every)) == 0:
            new_ranks = new_ranks.persist()
            new_ranks.count()  # materialize before dropping the parent
            if persisted is not None:
                persisted.unpersist()
            persisted = new_ranks
        ranks = new_ranks
    nodes.unpersist()
    return ranks
