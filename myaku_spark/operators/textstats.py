"""Text analysis operators for corpus curation: language ID, quality
scoring, token counting, fingerprinting.

All JVM-side Catalyst expressions except where Python string semantics
are required (alnum parity — textfns.alnum_count_udf).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword-ratio
# language-ID heuristic. Deliberately small and deterministic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "una"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "de": ["der", "die", "und", "das", "ein", "nicht", "mit", "ist"],
}


# Whitespace-run split pattern, spelled as the explicit character class
# RE2's \s matches ([\t\n\f\r ]) instead of Java-regex \s (which also
# matches U+000B vertical tab): the DuckDB oracles split with RE2 \s+,
# so a \x0B-bearing document would silently diverge between engines
# under Java \s+ (ADVICE r6, gopher item — applied to every
# oracle-paired split). Same portability move as dedup.PUNCT_CLASS.
WS_SPLIT = "[ \\t\\n\\f\\r]+"


def charclass_ratios(text: Column) -> dict[str, Column]:
    """Character-class ratios used by both lang-ID and quality scoring."""
    total = F.greatest(F.length(text), F.lit(1))
    def ratio(pattern):
        return (
            F.length(text) - F.length(F.regexp_replace(text, pattern, ""))
        ) / total

    return {
        "hiragana": ratio(r"[ぁ-ゟ]"),
        "katakana": ratio(r"[゠-ヿ]"),
        "cjk": ratio(r"[一-鿿]"),
        "hangul": ratio(r"[가-힯]"),
        "cyrillic": ratio(r"[Ѐ-ӿ]"),
        "latin": ratio(r"[A-Za-z]"),
        "digit": ratio(r"[0-9]"),
        "punct": ratio(r"[^\w\s　-ヿ一-鿿]"),
        "space": ratio(r"\s"),
    }


def detect_language(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Script-ratio + stopword-marker language ID heuristic.

    CJK scripts decide directly from character classes; Latin-script
    languages are ranked by marker-stopword hit counts."""
    text = F.col(text_col)
    r = charclass_ratios(text)
    toks = F.split(F.lower(text), WS_SPLIT)
    marker_counts = {
        lang: F.size(
            F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(w) for w in words]),
            )
        )
        for lang, words in LANG_MARKERS.items()
    }
    best_latin = F.lit("en")
    best_count = marker_counts["en"]
    for lang in ["es", "fr", "de"]:
        cond = marker_counts[lang] > best_count
        best_latin = F.when(cond, F.lit(lang)).otherwise(best_latin)
        best_count = F.when(cond, marker_counts[lang]).otherwise(best_count)
    lang = (
        F.when(r["hiragana"] + r["katakana"] > 0.05, F.lit("ja"))
        .when(r["hangul"] > 0.2, F.lit("ko"))
        .when(r["cjk"] > 0.3, F.lit("zh"))
        .when(r["cyrillic"] > 0.3, F.lit("ru"))
        .when(r["latin"] > 0.2, best_latin)
        .otherwise(F.lit("und"))
    )
    return df.withColumn(out_col, lang)


def quality_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality signals: length, token stats, punct/space ratios,
    stopword ratio, mean token length — the usual pre-training filters."""
    text = F.col(text_col)
    r = charclass_ratios(text)
    toks = F.filter(F.split(text, WS_SPLIT), lambda t: F.length(t) > 0)
    n_toks = F.size(toks)
    stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    stop_hits = F.size(
        F.filter(F.transform(toks, F.lower), lambda t: F.array_contains(stop, t))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text).alias("n_chars"),
        n_toks.alias("n_tokens"),
        (F.length(F.concat_ws("", toks)) / F.greatest(n_toks, F.lit(1))).alias(
            "mean_token_len"
        ),
        r["punct"].alias("punct_ratio"),
        r["space"].alias("space_ratio"),
        (stop_hits / F.greatest(n_toks, F.lit(1))).alias("stopword_ratio"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (
            F.size(F.array_distinct(toks)) / F.greatest(n_toks, F.lit(1))
        ).alias("ttr"),
    )


def quality_filter(
    signals: DataFrame,
    min_tokens: int = 10,
    max_punct_ratio: float = 0.3,
    min_ttr: float = 0.1,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 20.0,
) -> DataFrame:
    """Gopher-style rule filter over quality_signals output."""
    return signals.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
        & (F.col("ttr") >= min_ttr)
        & (F.col("mean_token_len").between(min_mean_token_len, max_mean_token_len))
    )


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (regex word pieces:
    letter runs, digit runs, single punctuation — the standard pretok)."""
    text = F.col(text_col)
    ws = F.size(F.filter(F.split(text, WS_SPLIT), lambda t: F.length(t) > 0))
    pieces = F.size(
        F.filter(
            F.split(
                F.regexp_replace(text, r"(\p{L}+|\p{N}+|[^\p{L}\p{N}\s])", "$1"),
                "",
            ),
            lambda t: F.length(t) > 0,
        )
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("n_ws_tokens"),
        pieces.alias("n_subword_pieces"),
    )



def token_gram_rows(
    df: DataFrame,
    k: int,
    gram_sql: str,
    out_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    distinct: bool = False,
) -> DataFrame:
    """Exploded k-token grams over a whitespace split — THE shared
    materialize-then-slice pattern: the token array gets its own
    projection (slice(split(text)) inside a lambda re-evaluates the
    split per gram, quadratic per doc) and the index sequence is
    CASE-guarded (Spark's sequence(1, 0) counts DOWN and slice(_, 0, k)
    throws on docs shorter than k). ``gram_sql`` is the per-gram SQL
    over (_toks, i). ``distinct`` dedups grams INSIDE the per-doc array
    (array_distinct, original first-occurrence order) before the
    explode — a gram only repeats within its own doc, so this equals a
    corpus-wide distinct on (doc_id, gram) at zero shuffle cost."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), WS_SPLIT).alias("_toks"),
    )
    expr = (
        f"transform(CASE WHEN size(_toks) >= {k}"
        f" THEN sequence(1, size(_toks) - {k - 1})"
        f" ELSE array() END, i -> {gram_sql})"
    )
    if distinct:
        expr = f"array_distinct({expr})"
    return base.select("doc_id", F.explode(F.expr(expr)).alias(out_col))


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", window: int = 8
) -> DataFrame:
    """Winnowing-style document fingerprints: hash every ``window``-gram of
    tokens, keep per-doc minima per band — robust content fingerprints for
    fuzzy matching. Returns (doc_id, band, fp)."""
    g = token_gram_rows(
        df, window,
        f"xxhash64(concat_ws(' ', slice(_toks, i, {window})))",
        "gh", text_col, id_col,
    )
    return g.groupBy("doc_id", F.pmod(F.col("gh"), F.lit(4)).alias("band")).agg(
        F.min("gh").alias("fp")
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. appendix A): the
    duplicate-line fraction and the most-common-2-gram fraction —
    documents dominated by repeated lines or a single bigram are
    boilerplate/spam in a pre-training corpus.

    All JVM-side: lines explode from a newline split; 2-grams from the
    slice/transform shingle construction (no Python, no driver state);
    one groupBy(doc) aggregation each — partitioned by doc_id, never
    hot."""
    text = F.col(text_col)
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(text, "\n")).alias("line"),
    )
    line_stats = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("line").alias("n_distinct_lines"),
    )
    grams = token_gram_rows(
        df, 2, "concat_ws(' ', slice(_toks, i, 2))", "gram",
        text_col, id_col,
    ).filter(F.length("gram") > 0)
    gram_counts = grams.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    gram_stats = gram_counts.groupBy("doc_id").agg(
        F.max("cnt").alias("top_gram_cnt"),
        F.sum("cnt").alias("n_grams"),
    )
    return line_stats.join(gram_stats, "doc_id", "left").select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.round(
            (F.col("n_lines") - F.col("n_distinct_lines"))
            / F.col("n_lines"),
            4,
        ).alias("dup_line_frac"),
        F.round(
            F.coalesce(F.col("top_gram_cnt") / F.col("n_grams"), F.lit(0.0)),
            4,
        ).alias("top_2gram_frac"),
    )


# --- PII detection / redaction ----------------------------------------------

# Patterns are deliberately RE2-compatible (no backrefs/lookaround) so the
# DuckDB oracle can run them verbatim; Java and RE2 agree on these.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}
# Redaction applies in this fixed order (emails can embed dotted quads).
PII_ORDER = ["email", "ipv4", "phone"]


def pii_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc PII match counts (emails, IPv4s, NANP-style phone numbers)
    — the pre-training scrub signal. Pure Catalyst regexp_count: scales
    as a projection, no shuffle at all."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[
            F.regexp_count(text, F.lit(PII_PATTERNS[k])).cast("long").alias(
                f"n_{k}"
            )
            for k in PII_ORDER
        ],
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
    token: str = "<PII>",
) -> DataFrame:
    """Replace every PII match with ``token`` (fixed pattern order so the
    result is deterministic). Projection-only like pii_signals."""
    out = F.col(text_col)
    for k in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[k], token)
    return df.withColumn(out_col, out)


# --- deterministic weighted sampling -----------------------------------------


def uniform_hash(key: Column, salt: str) -> Column:
    """Deterministic uniform in [0,1) from md5(key || ':' || salt).

    md5 rather than xxhash64 so the draw is reproducible across engines
    (the DuckDB oracle replays the identical arithmetic); still a JVM
    codegen expression. Uses 56 digest bits: values above 2^53 round to
    the nearest representable double, but both engines apply the same
    IEEE round-half-even on the cast, so the draw stays deterministic
    and uniform to well below any sampling-rate granularity."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 14
        ),
        16,
        10,
    )
    return h.cast("double") / float(1 << 56)


def rate_column(
    weights: dict[str, float] | None,
    domain_col: str = "source",
    default_rate: float = 0.0,
) -> Column:
    """Per-domain sampling rate as a CASE chain (shared by
    weighted_sample and the curation funnel)."""
    rate = None
    for dom, w in sorted((weights or {}).items()):
        cond = F.col(domain_col) == dom
        rate = (
            F.when(cond, F.lit(float(w)))
            if rate is None
            else rate.when(cond, F.lit(float(w)))
        )
    return (
        rate.otherwise(F.lit(float(default_rate)))
        if rate is not None
        else F.lit(float(default_rate))
    )


def weighted_sample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-domain Bernoulli sampling for corpus mixing: keep a row iff
    uniform_hash(key) < weight(domain). Stateless and deterministic —
    re-running, resuming, or changing partitioning never changes the
    sample, and upweighting a domain later keeps the earlier draw as a
    strict subset (the hash threshold property). A filter-only plan:
    pushes past scans, no shuffle, identical at any scale."""
    u = uniform_hash(F.col(key_col), salt)
    return df.filter(u < rate_column(weights, domain_col, default_rate))


# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1) — the
# full per-document rule set used by MassiveText-style webtext
# curation. Thresholds are the published ones.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_HASH_RATIO = 0.1          # '#' symbols per word
GOPHER_MAX_ELLIPSIS_RATIO = 0.1      # '...' occurrences per word
GOPHER_MAX_BULLET_LINE_FRAC = 0.9    # lines starting with a bullet
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.3  # lines ending with '...'
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8     # words containing >=1 letter
GOPHER_MIN_STOPWORD_HITS = 2         # distinct required stopwords seen
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc Gopher rule signals + the combined keep flag.

    Pure projection (JVM higher-order functions over the split word /
    line arrays — no UDF, no shuffle, pushes past the scan like every
    other textstats filter); a NULL text fails the word-count floor and
    lands kept=false with zeroed signals."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(text, WS_SPLIT), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = F.length(F.concat_ws("", words)) / nw
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / nw
    )
    hash_ratio = (
        (F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit(""))))
        / nw
    )
    ellipsis_ratio = (
        (
            F.length(text)
            - F.length(F.replace(text, F.lit("..."), F.lit("")))
        )
        / F.lit(3.0)
        / nw
    )
    lines = F.filter(
        F.split(text, r"\n"), lambda l: F.length(F.trim(l)) > 0
    )
    nl = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: F.trim(l).startswith("- ")
                | F.trim(l).startswith("* ")
                | F.trim(l).startswith("•"),
            )
        )
        / nl
    )
    ell_line_frac = (
        F.size(F.filter(lines, lambda l: F.rtrim(l).endswith("...")))
        / nl
    )
    stop = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)), stop
        )
    )
    keep = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN)
        & (hash_ratio <= GOPHER_MAX_HASH_RATIO)
        & (ellipsis_ratio <= GOPHER_MAX_ELLIPSIS_RATIO)
        & (bullet_frac <= GOPHER_MAX_BULLET_LINE_FRAC)
        & (ell_line_frac <= GOPHER_MAX_ELLIPSIS_LINE_FRAC)
        & (alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (stop_hits >= GOPHER_MIN_STOPWORD_HITS)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        F.round(hash_ratio, 4).alias("hash_ratio"),
        F.round(ellipsis_ratio, 4).alias("ellipsis_ratio"),
        F.round(bullet_frac, 4).alias("bullet_line_frac"),
        F.round(ell_line_frac, 4).alias("ellipsis_line_frac"),
        stop_hits.cast("int").alias("stopword_hits"),
        keep.alias("kept"),
    )
