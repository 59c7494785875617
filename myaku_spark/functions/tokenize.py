"""Tokenization → (term, start, len) token streams with exact char offsets.

Two engines, one output contract (the ``token`` struct):

1. ``tokenize_whitespace_col`` — pure Catalyst (no Python): split on a
   single space and compute running char offsets with the ``aggregate``
   higher-order function. Used for the language-agnostic ``documents``
   driver tables; every stage is SQL-expressible, so the DuckDB oracle
   can replay it.

2. ``ja_tokens_udf`` — Arrow-vectorized pandas UDF for Japanese text.
   Reproduces the reference *pipeline shape* (T1 block split with running
   offsets, japanese_analysis.py:172-211; width normalization of base
   forms, datatypes.py:399-405; symbol-token filter P10,
   japanese_analysis.py:371-384; JMdict-style n-gram meta lexical items
   T4, japanese_analysis.py:248-369) with a deterministic pure-Python
   segmenter, since MeCab/ipadic-NEologd are not installable in this
   environment. Segmentation is unicode-script-run based with a
   longest-match function-word lexicon; the dictionary is pluggable so a
   MeCab backend can be dropped in for byte-parity when available
   (dictionary version is part of the index contract, see
   japanese_analysis.py:50-66).

Token struct: (surface, term, start, len, pos, sources)
  - term = width-normalized base form (the posting key)
  - start/len = char offsets into the document text (ArticleTextPosition,
    datatypes.py:115-131)
  - pos = coarse part-of-speech tag ('記号' rows are droppable per P10)
  - sources = interp source codes (1=MECAB-style segmenter,
    2=DICT_DECOMP, 3=DICT_SURFACE, 4=DICT_BASE; datatypes.py:33-54)
"""

from __future__ import annotations

import unicodedata
from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from myaku_spark.functions.widthnorm import normalize_char_width

TOKEN_SCHEMA = StructType(
    [
        StructField("surface", StringType()),
        StructField("term", StringType()),
        StructField("start", IntegerType()),
        StructField("len", IntegerType()),
        StructField("pos", StringType()),
        StructField("sources", ArrayType(IntegerType())),
    ]
)

# ---------------------------------------------------------------------------
# 1. Whitespace tokenizer — pure Catalyst, offsets via aggregate() HOF.
# ---------------------------------------------------------------------------

_WS_TOKENS_EXPR = """
aggregate(
  split({col}, ' '),
  named_struct(
    'off', 0,
    'toks', cast(array() as array<struct<tok:string, start:int>>)),
  (acc, t) -> named_struct(
    'off', acc.off + length(t) + 1,
    'toks', array_append(acc.toks, named_struct('tok', t, 'start', acc.off))),
  acc -> filter(acc.toks, x -> length(x.tok) > 0)
)
"""


def tokenize_whitespace_col(col_name: str) -> Column:
    """array<struct<tok,start>> of space-separated tokens with char offsets.

    Runs entirely inside whole-stage codegen — no shuffle, no Python.
    Offsets assume single-space separation (start of token i = sum of
    lengths of preceding tokens + i), matching the oracle SQL's window sum.
    """
    return F.expr(_WS_TOKENS_EXPR.format(col=col_name))


def explode_whitespace_tokens(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, start, len) rows — one per token occurrence."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_whitespace_col(text_col)).alias("t"),
    )
    return toks.select(
        "doc_id",
        F.col("t.tok").alias("term"),
        F.col("t.start").alias("start"),
        F.length("t.tok").alias("len"),
    )


# ---------------------------------------------------------------------------
# 2. Japanese tokenizer — deterministic script-run segmenter + lexicon.
# ---------------------------------------------------------------------------

# Function words / auxiliaries for hiragana-run refinement (longest match).
# This plays the role of the MeCab dictionary's closed-class entries; it is
# intentionally small and versioned (the index contract pins it).
JA_FUNCTION_WORDS = [
    "けれども", "だから", "しかし", "そして", "ところが", "それでも",
    "ですから", "ながら", "について", "における", "によって", "として",
    "という", "ばかり", " まで", "など", "だけ", "でも", "から", "まで",
    "より", "ほど", "でした", "ました", "ません", "ている", "ていた",
    "です", "ます", "した", "ない", "なら", "ので", "のに", "こと",
    "もの", "それ", "これ", "あれ", "ここ", "そこ", "は", "が", "を",
    "に", "で", "と", "も", "の", "へ", "や", "か", "な", "だ", "た",
    "て", "し", "う", "よ", "ね", "ぞ",
]
JA_LEXICON_VERSION = "builtin-fw-1"

_FW_SORTED = sorted({w.strip() for w in JA_FUNCTION_WORDS}, key=len, reverse=True)
_FW_MAXLEN = max(len(w) for w in _FW_SORTED)
_FW_SET = set(_FW_SORTED)


def _script_class(ch: str) -> str:
    o = ord(ch)
    if 0x3041 <= o <= 0x309F:
        return "hira"
    if 0x30A0 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF or ch == "ー":
        return "kata"
    if (
        0x4E00 <= o <= 0x9FFF
        or 0x3400 <= o <= 0x4DBF
        or 0xF900 <= o <= 0xFAFF
        or ch in "々〆ヵヶ"
    ):
        return "kanji"
    if ch.isalnum():
        return "alnum"
    if ch.isspace():
        return "space"
    return "sym"


def _split_hira_run(run: str, start: int) -> Iterable[tuple[str, int, str]]:
    """Longest-match function-word segmentation of a hiragana run."""
    i, n = 0, len(run)
    while i < n:
        matched = None
        for ln in range(min(_FW_MAXLEN, n - i), 0, -1):
            cand = run[i : i + ln]
            if cand in _FW_SET:
                matched = cand
                break
        if matched:
            yield matched, start + i, "助詞"
            i += len(matched)
        else:
            # Consume up to the next function-word boundary as one content
            # token (keeps segmentation deterministic and reversible).
            j = i + 1
            while j < n:
                hit = False
                for ln in range(min(_FW_MAXLEN, n - j), 0, -1):
                    if run[j : j + ln] in _FW_SET:
                        hit = True
                        break
                if hit:
                    break
                j += 1
            yield run[i:j], start + i, "動詞"
            i = j


def tokenize_ja_block(block: str, offset: int) -> list[dict]:
    """Tokenize one newline-free text block; offsets are absolute."""
    tokens: list[dict] = []
    i, n = 0, len(block)
    while i < n:
        cls = _script_class(block[i])
        j = i + 1
        while j < n and _script_class(block[j]) == cls:
            j += 1
        run = block[i:j]
        if cls == "space":
            pass
        elif cls == "sym":
            tokens.append(
                dict(surface=run, start=offset + i, length=len(run), pos="記号")
            )
        elif cls == "hira":
            for tok, st, pos in _split_hira_run(run, offset + i):
                tokens.append(dict(surface=tok, start=st, length=len(tok), pos=pos))
        else:
            pos = {"kanji": "名詞", "kata": "名詞", "alnum": "名詞"}[cls]
            tokens.append(
                dict(surface=run, start=offset + i, length=len(run), pos=pos)
            )
        i = j
    return tokens


def _dict_ngram_items(
    toks: list[dict], lexicon: set[str], max_len: int
) -> Iterable[dict]:
    """JMdict-style meta lexical items (T4, japanese_analysis.py:248-369).

    For every contiguous token span whose concatenated surface length is
    within the lexicon's max entry length, probe the lexicon with the
    concatenated surface form; a hit emits one extra item spanning the
    tokens (position = span start, len = concatenated surface length),
    tagged source 3 (DICT_SURFACE).
    """
    n = len(toks)
    for a in range(n):
        surf = ""
        for b in range(a, n):
            # Require adjacency (no gaps) so positions stay contiguous.
            if b > a and toks[b]["start"] != toks[b - 1]["start"] + toks[b - 1]["length"]:
                break
            surf += toks[b]["surface"]
            if len(surf) > max_len:
                break
            if b > a and surf in lexicon:
                yield dict(
                    surface=surf,
                    start=toks[a]["start"],
                    length=len(surf),
                    pos="名詞",
                    sources=[3],
                )


def tokenize_ja_text(
    text: str, lexicon: set[str] | None = None, keep_symbols: bool = False
) -> list[dict]:
    """Full-document tokenize: T1 block split + per-block segment + T4.

    Newline handling matches japanese_analysis.py:186-209: split on
    ``str.splitlines``, empty block advances offset by 1, non-empty block
    advances by len+1.
    """
    blocks = text.splitlines()
    offset = 0
    out: list[dict] = []
    max_len = max((len(w) for w in lexicon), default=0) if lexicon else 0
    for block in blocks:
        if len(block) == 0:
            offset += 1
            continue
        toks = tokenize_ja_block(block, offset)
        base = [t for t in toks if t["pos"] != "記号"] if not keep_symbols else toks
        for t in base:
            t.setdefault("sources", [1])
        out.extend(base)
        if lexicon:
            out.extend(_dict_ngram_items(base, lexicon, max_len))
        offset += len(block) + 1
    # Width-normalize term keys (datatypes.py:399-405).
    for t in out:
        t["term"] = normalize_char_width(t["surface"])
    return out


def make_ja_tokens_udf(lexicon: set[str] | None = None):
    """pandas UDF: text → array<token struct> (Arrow-batched, no per-row
    Python at the Spark API level; the per-doc loop runs inside the batch)."""

    @F.pandas_udf(ArrayType(TOKEN_SCHEMA))
    def ja_tokens(col: pd.Series) -> pd.Series:
        def run(s):
            if s is None:
                return None
            return [
                (
                    t["surface"],
                    t["term"],
                    t["start"],
                    t["length"],
                    t["pos"],
                    t.get("sources", [1]),
                )
                for t in tokenize_ja_text(s, lexicon=lexicon)
            ]

        return col.map(run)

    return ja_tokens


def explode_ja_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lexicon: set[str] | None = None,
) -> DataFrame:
    """(doc_id, term, start, len, pos, sources) token rows for Japanese."""
    udf = make_ja_tokens_udf(lexicon)
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(udf(F.col(text_col))).alias("t")
    )
    return toks.select(
        "doc_id",
        F.col("t.term").alias("term"),
        F.col("t.start").alias("start"),
        F.col("t.len").alias("len"),
        F.col("t.pos").alias("pos"),
        F.col("t.sources").alias("sources"),
    )


def is_katakana(s: str) -> bool:
    return all(_script_class(c) in ("kata",) for c in s)


def nfkc(s: str) -> str:
    return unicodedata.normalize("NFKC", s)
