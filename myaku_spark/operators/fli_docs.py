"""Found-lexical-item documents: the reference's search-result document
shape (datastore/document_convert.py:175-225), built relationally.

One row per (term, article) with:
- base_form (+ the definite/possible group aliases — the reference sets
  all three to base_form because the DEFINITE/POSSIBLE alt-form query
  types are declared but unimplemented, datastore/__init__.py:26-68),
- found_positions (sorted struct array) and the exact/definite/possible
  counts (all len(found_positions), document_convert.py:208-210),
- possible_interps (distinct interps: sources key, JMdict entry id,
  POS) and interp_position_map (positions per interp INDEX into
  possible_interps, present only for interps that do not cover all
  positions — datatypes.py:428-505 reduce semantics),
- quality_score_{exact,definite,possible} = article_quality_score +
  the tf-bucket modifier (document_convert.py:201,216-222).

Everything is two groupBys over the analysis sidecar joined broadcast-
style to the docs table — no blob decode, no driver loops; at 10^12
docs this is the same partitioned aggregation shape as the posting
build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myaku_spark.operators.scoring import tf_score_mod_col

# The reference's query-type → field indirection
# (database.py QUERY_TYPE_QUERY_FIELD_MAP / SCORE_FIELD_MAP).
QUERY_TYPE_QUERY_FIELD = {
    "exact": "base_form",
    "definite": "base_form_definite_group",
    "possible": "base_form_possible_group",
}
QUERY_TYPE_SCORE_FIELD = {
    "exact": "quality_score_exact",
    "definite": "quality_score_definite",
    "possible": "quality_score_possible",
}
QUERY_TYPE_COUNT_FIELD = {
    "exact": "found_positions_exact_count",
    "definite": "found_positions_definite_count",
    "possible": "found_positions_possible_count",
}
QUERY_TYPE_MOD_FIELD = {
    "exact": "quality_score_exact_mod",
    "definite": "quality_score_definite_mod",
    "possible": "quality_score_possible_mod",
}


def search_fli_documents(
    fli_docs: DataFrame, term: str, query_type: str = "exact", k: int = 10
) -> DataFrame:
    """The reference's indexed FLI query for one term under a query
    type: filter on THAT type's match-group field and rank by THAT
    type's score field + last-updated + doc_id descending — the exact
    compound-index order (database.py:296-323: (query_field, score
    field, article_last_updated_datetime, article_oid) DESC). Each
    query type genuinely reads its own stored columns; their values
    coincide because the reference stores the three families as equal
    (document_convert.py:204-222 — DEFINITE/POSSIBLE are declared but
    unimplemented upstream)."""
    if query_type not in QUERY_TYPE_QUERY_FIELD:
        raise ValueError(f"unknown query_type: {query_type!r}")
    qf = QUERY_TYPE_QUERY_FIELD[query_type]
    sf = QUERY_TYPE_SCORE_FIELD[query_type]
    return (
        fli_docs.filter(F.col(qf) == term)
        .orderBy(
            F.desc(sf),
            F.desc("article_last_updated_datetime"),
            F.desc("doc_id"),
        )
        .limit(k)
    )


def build_fli_documents(
    analysis: DataFrame, docs: DataFrame, terms: list[str] | None = None
) -> DataFrame:
    """analysis (doc_id, term, start, len, pos, sources, entry_id) ⋈
    docs (doc_id, url, doc_score, doc_ts) → FLI documents."""
    a = analysis
    if terms is not None:
        a = a.filter(F.col("term").isin(list(terms)))
    # Older sidecars predate the conjugation columns; treat as untagged.
    for c in ("conj_type", "conj_form"):
        if c not in a.columns:
            a = a.withColumn(c, F.lit(None).cast("string"))
    interp = F.struct(
        F.array_join(
            F.transform(F.col("sources"), lambda x: x.cast("string")), ","
        ).alias("interp_sources"),
        F.coalesce(F.col("entry_id"), F.lit("")).alias("jmdict_entry_id"),
        F.coalesce(F.col("pos"), F.lit("")).alias("parts_of_speech"),
        # MecabLexicalItemInterp conjugated_type/form
        # (datatypes.py:329-342): part of interp identity, so positions
        # of e.g. 曇り vs 曇った in one article land on DISTINCT interps
        # exactly as the reference's dataclass equality implies.
        F.coalesce(F.col("conj_type"), F.lit("")).alias("conjugated_type"),
        F.coalesce(F.col("conj_form"), F.lit("")).alias("conjugated_form"),
    )
    per_interp = (
        a.select("doc_id", "term", "start", "len", interp.alias("interp"))
        .groupBy("doc_id", "term", "interp")
        .agg(
            F.sort_array(
                F.collect_set(F.struct(F.col("start"), F.col("len")))
            ).alias("ipositions")
        )
    )
    fli = per_interp.groupBy("doc_id", "term").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("interp"), F.col("ipositions")))
        ).alias("_interps")
    )
    fli = (
        fli.withColumn(
            "found_positions",
            F.sort_array(
                F.array_distinct(F.flatten(F.col("_interps.ipositions")))
            ),
        )
        .withColumn("possible_interps", F.col("_interps.interp"))
        .withColumn(
            "interp_position_map",
            F.expr(
                "filter(transform(_interps, (x, i) ->"
                " struct(i AS interp_idx, x.ipositions AS positions)),"
                " s -> size(s.positions) < size(found_positions))"
            ),
        )
        .withColumn(
            "interp_position_map",
            F.when(
                F.size("interp_position_map") > 0, F.col("interp_position_map")
            ),
        )
        .drop("_interps")
    )
    n_pos = F.size("found_positions")
    out = (
        fli.join(
            docs.select("doc_id", "url", "doc_score", "doc_ts"), "doc_id"
        )
        .withColumn("quality_score_mod", tf_score_mod_col(n_pos).cast("long"))
        .withColumn(
            "quality_score_exact",
            (F.col("doc_score") + F.col("quality_score_mod")).cast("long"),
        )
    )
    return out.select(
        F.col("term").alias("base_form"),
        F.col("term").alias("base_form_definite_group"),
        F.col("term").alias("base_form_possible_group"),
        F.col("doc_id"),
        F.col("url").alias("article_url"),
        "found_positions",
        n_pos.cast("long").alias("found_positions_exact_count"),
        n_pos.cast("long").alias("found_positions_definite_count"),
        n_pos.cast("long").alias("found_positions_possible_count"),
        "possible_interps",
        "interp_position_map",
        F.col("quality_score_mod").alias("quality_score_exact_mod"),
        F.col("quality_score_mod").alias("quality_score_definite_mod"),
        F.col("quality_score_mod").alias("quality_score_possible_mod"),
        F.col("doc_score").cast("long").alias("article_quality_score"),
        F.col("doc_ts").alias("article_last_updated_datetime"),
        "quality_score_exact",
        F.col("quality_score_exact").alias("quality_score_definite"),
        F.col("quality_score_exact").alias("quality_score_possible"),
    )
