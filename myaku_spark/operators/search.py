"""Index searcher: term-pruned segment reads → block-max WAND → hydration.

The Spark re-architecture of the reference search path
(/root/reference/myaku/datastore/index_search.py:207-248): K1 ranked
posting scan becomes WAND over term-partition-pruned segments; K2
pagination is a slice of the returned top-k; J1/J2 hydration is a
broadcast join of the (≤ k·pages) result doc_ids against the docs table.
Queries are width-normalized with the same P6 function used at index
time (symmetry contract, views.py:305-310).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myaku_spark.functions.widthnorm import normalize_char_width
from myaku_spark.operators.bm25 import PAGE_SIZE
from myaku_spark.operators.segments import read_term_segments
from myaku_spark.operators.wand import (
    BM25Scorer,
    MyakuScorer,
    cursors_from_segments,
    exhaustive_topk,
    stats_for_bm25,
    wand_topk_and,
    wand_topk_or,
)


class IndexSearcher:
    def __init__(
        self, spark: SparkSession, index_dir: str, mode: str = "myaku"
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.mode = mode
        from myaku_spark.plans.incremental import load_tombstones

        self.deleted = load_tombstones(spark, index_dir)
        if mode == "bm25":
            r = spark.read.parquet(f"{index_dir}/corpus_stats").collect()[0]
            self.n_docs, self.avgdl = int(r.n_docs), float(r.avgdl)

    def _scorer_factory(self, terms: list[str]):
        if self.mode == "myaku":
            return lambda term: MyakuScorer()
        tstats = (
            self.spark.read.parquet(f"{self.index_dir}/term_stats")
            .filter(F.col("term").isin(terms))
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .collect()
        )
        df_map = {r.term: int(r.df) for r in tstats}
        return lambda term: BM25Scorer(
            idf=stats_for_bm25(self.n_docs, df_map.get(term, 0)),
            avgdl=self.avgdl,
        )

    _CACHE_MAX_TERMS = 256

    def _cursors(self, terms: list[str]):
        """Segment rows per term, with a driver-side LRU over raw rows.

        The analog of the reference's user next-page cache
        (cache.py:316-459): repeated/paginated queries skip the segment
        read entirely. Cursors are rebuilt per query (they are stateful
        iterators); only the immutable segment rows are cached."""
        if not hasattr(self, "_row_cache"):
            from collections import OrderedDict

            self._row_cache = OrderedDict()
        missing = [t for t in terms if t not in self._row_cache]
        if missing:
            rows = read_term_segments(
                self.spark, f"{self.index_dir}/segments", missing
            ).collect()
            by_term: dict[str, list] = {t: [] for t in missing}
            for r in rows:
                by_term.setdefault(r.term, []).append(r)
            for t in missing:
                self._row_cache[t] = by_term.get(t, [])
            while len(self._row_cache) > self._CACHE_MAX_TERMS:
                self._row_cache.popitem(last=False)
        rows = []
        for t in terms:
            if t in self._row_cache:
                self._row_cache.move_to_end(t)
                rows.extend(self._row_cache[t])
        return cursors_from_segments(
            rows, self._scorer_factory(terms), deleted=self.deleted or None
        )

    def search(
        self,
        query: str | list[str],
        k: int = PAGE_SIZE,
        combine: str = "and",
        exhaustive: bool = False,
    ) -> list[tuple[float, int]]:
        """Top-k (score, doc_id) for the query terms.

        ``exhaustive=True`` runs the full-scan oracle instead of WAND —
        used by tests to assert rank-identity of the two paths."""
        if isinstance(query, str):
            terms = [normalize_char_width(t) for t in query.split()]
        else:
            terms = [normalize_char_width(t) for t in query]
        cursors = list(self._cursors(terms).values())
        if not cursors:
            return []
        if exhaustive:
            return exhaustive_topk(cursors, k, mode=combine)
        if combine == "and":
            return wand_topk_and(cursors, k)
        return wand_topk_or(cursors, k)

    def hydrate(self, results: list[tuple[float, int]]) -> DataFrame:
        """J1: join result doc_ids back to the docs table (broadcast)."""
        if not results:
            return self.spark.createDataFrame([], "doc_id long, score double")
        rdf = self.spark.createDataFrame(
            [(int(d), float(s), i + 1) for i, (s, d) in enumerate(results)],
            ["doc_id", "score", "rank"],
        )
        docs = self.spark.read.parquet(f"{self.index_dir}/docs")
        return docs.join(F.broadcast(rdf), "doc_id").orderBy("rank")

    def search_page(
        self, query, page_num: int = 1, k: int = PAGE_SIZE, combine: str = "and"
    ) -> DataFrame:
        """K2 pagination: page N of results, hydrated."""
        top = self.search(query, k * page_num, combine)
        page = top[(page_num - 1) * k : page_num * k]
        return self.hydrate(page)
