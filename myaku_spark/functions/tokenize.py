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


# Compiled run/segment regex: one C-speed pass per block. Groups ordered
# so classification falls out of lastgroup. Must stay behavior-identical
# to the per-char _script_class walk (property-tested in test_tokenize).
import re as _re

# Class ranges mirror _script_class priority: hira/kata are checked
# before kanji there, so \u30f5\u30f6 (inside the katakana block) stay kata.
_KANJI = r"\u4e00-\u9fff\u3400-\u4dbf\uf900-\ufaff\u3005\u3006"
_HIRA = r"\u3041-\u309f"
_KATA = r"\u30a0-\u30ff\u31f0-\u31ff"
_RUN_REGEX = _re.compile(
    f"(?P<hira>[{_HIRA}]+)"
    f"|(?P<kata>[{_KATA}]+)"
    f"|(?P<kanji>[{_KANJI}]+)"
)

_FW_REGEX_CACHE: dict = {}


def _fw_regex():
    key = "fw"
    if key not in _FW_REGEX_CACHE:
        # Longest-first alternation ≡ longest-match at each position.
        _FW_REGEX_CACHE[key] = _re.compile(
            "|".join(_re.escape(w) for w in _FW_SORTED)
        )
    return _FW_REGEX_CACHE[key]


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


def _split_hira_run_slow(run: str, start: int) -> Iterable[tuple[str, int, str]]:
    """Longest-match function-word segmentation (reference twin of the
    regex fast path; kept for property testing)."""
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
                j += 1 if not hit else 0
                if hit:
                    break
            yield run[i:j], start + i, "動詞"
            i = j


def _split_hira_run(run: str, start: int) -> Iterable[tuple[str, int, str]]:
    """Regex fast path: leftmost match with longest-first alternation ≡
    the slow path's longest-match-at-each-position walk."""
    pos = 0
    for m in _fw_regex().finditer(run):
        s, e = m.span()
        if s > pos:
            yield run[pos:s], start + pos, "動詞"
        yield m.group(), start + s, "助詞"
        pos = e
    if pos < len(run):
        yield run[pos:], start + pos, "動詞"


def tokenize_ja_block_slow(block: str, offset: int) -> list[dict]:
    """Per-char reference implementation (property-test twin)."""
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
            for tok, st, pos in _split_hira_run_slow(run, offset + i):
                tokens.append(dict(surface=tok, start=st, length=len(tok), pos=pos))
        else:
            pos = {"kanji": "名詞", "kata": "名詞", "alnum": "名詞"}[cls]
            tokens.append(
                dict(surface=run, start=offset + i, length=len(run), pos=pos)
            )
        i = j
    return tokens


def _emit_other(seg: str, offset: int, tokens: list) -> None:
    """Char-wise alnum/sym/space segmentation for non-CJK gaps."""
    i, n = 0, len(seg)
    while i < n:
        ch = seg[i]
        if ch.isspace():
            j = i + 1
            while j < n and seg[j].isspace():
                j += 1
        elif ch.isalnum():
            j = i + 1
            while j < n and seg[j].isalnum() and not seg[j].isspace():
                j += 1
            tokens.append(
                dict(surface=seg[i:j], start=offset + i, length=j - i, pos="名詞")
            )
        else:
            j = i + 1
            while j < n and not seg[j].isalnum() and not seg[j].isspace():
                j += 1
            tokens.append(
                dict(surface=seg[i:j], start=offset + i, length=j - i, pos="記号")
            )
        i = j


def tokenize_ja_block(block: str, offset: int) -> list[dict]:
    """Tokenize one newline-free block (regex fast path; offsets absolute).

    CJK script runs come from one compiled-regex pass; the (short) gaps
    between them are segmented char-wise into alnum/symbol/space runs.
    Behavior-identical to tokenize_ja_block_slow (property-tested)."""
    tokens: list[dict] = []
    pos = 0
    for m in _RUN_REGEX.finditer(block):
        s, e = m.span()
        if s > pos:
            _emit_other(block[pos:s], offset + pos, tokens)
        kind = m.lastgroup
        run = m.group()
        if kind == "hira":
            for tok, st, p in _split_hira_run(run, offset + s):
                tokens.append(
                    dict(surface=tok, start=st, length=len(tok), pos=p)
                )
        else:  # kanji / kata
            tokens.append(
                dict(surface=run, start=offset + s, length=len(run), pos="名詞")
            )
        pos = e
    if pos < len(block):
        _emit_other(block[pos:], offset + pos, tokens)
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
    include_analysis: bool = False,
) -> DataFrame:
    """Token rows for Japanese: (doc_id, term, start, len[, pos, sources]).

    Emits rows directly from ``mapInPandas`` (Arrow columnar all the way)
    instead of array<struct> + explode — the latter materializes millions
    of short-lived JVM structs per batch and caps scaling on the GC.
    ``include_analysis`` adds the pos/sources analysis columns."""
    import pandas as pd

    base_cols = ["doc_id", "term", "start", "len"]
    schema = "doc_id long, term string, start int, len int"
    if include_analysis:
        schema += ", pos string, sources array<int>"

    def gen(batches):
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in base_cols}
            if include_analysis:
                out["pos"] = []
                out["sources"] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for t in tokenize_ja_text(text, lexicon=lexicon):
                    out["doc_id"].append(doc_id)
                    out["term"].append(t["term"])
                    out["start"].append(t["start"])
                    out["len"].append(t["length"])
                    if include_analysis:
                        out["pos"].append(t["pos"])
                        out["sources"].append(t.get("sources", [1]))
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    ).mapInPandas(gen, schema)


def ja_posting_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lexicon: set[str] | None = None,
) -> DataFrame:
    """Tokenize AND reduce per (term, doc) in one mapInPandas pass:
    (doc_id, term, tf, starts, lens, dl).

    The A1 aggregation (positions set-union + tf per (term, article),
    datatypes.py:428-505) is doc-LOCAL — the reference reduces it in
    memory per article (T5). Doing the same inside the tokenizer batch
    removes the token-level shuffle entirely: only posting rows (≈half
    the token count) ever leave the stage, and the JVM never materializes
    per-token structs. ``dl`` (doc length = token count) rides along for
    BM25 without a second pass.

    Uses mapInArrow with flat-offset ListArray construction — building
    pandas object-list columns for millions of posting rows costs more
    than the tokenization itself; RecordBatch assembly from flat numpy
    buffers is O(postings) with C-side copies only."""
    import numpy as np
    import pyarrow as pa

    schema = (
        "doc_id long, term string, tf int, starts array<int>,"
        " lens array<int>, dl long"
    )
    arrow_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int32()),
            ("starts", pa.list_(pa.int32())),
            ("lens", pa.list_(pa.int32())),
            ("dl", pa.int64()),
        ]
    )

    def gen(batches):
        for rb in batches:
            tbl = rb.to_pydict()
            doc_ids: list = []
            terms: list = []
            tfs: list = []
            flat_starts: list = []
            flat_lens: list = []
            offsets: list = [0]
            dls: list = []
            for doc_id, text in zip(tbl[id_col], tbl[text_col]):
                if text is None:
                    continue
                by_term: dict[str, set] = {}
                n_tokens = 0
                for t in tokenize_ja_text(text, lexicon=lexicon):
                    n_tokens += 1
                    by_term.setdefault(t["term"], set()).add(
                        (t["start"], t["length"])
                    )
                for term, posset in by_term.items():
                    pos = sorted(posset)
                    doc_ids.append(doc_id)
                    terms.append(term)
                    tfs.append(len(pos))
                    for p in pos:
                        flat_starts.append(p[0])
                        flat_lens.append(p[1])
                    offsets.append(len(flat_starts))
                    dls.append(n_tokens)
            off = pa.array(np.asarray(offsets, dtype=np.int32))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.asarray(doc_ids, dtype=np.int64)),
                    pa.array(terms, type=pa.string()),
                    pa.array(np.asarray(tfs, dtype=np.int32)),
                    pa.ListArray.from_arrays(
                        off, pa.array(np.asarray(flat_starts, dtype=np.int32))
                    ),
                    pa.ListArray.from_arrays(
                        off, pa.array(np.asarray(flat_lens, dtype=np.int32))
                    ),
                    pa.array(np.asarray(dls, dtype=np.int64)),
                ],
                schema=arrow_schema,
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    ).mapInArrow(gen, schema)


def is_katakana(s: str) -> bool:
    return all(_script_class(c) in ("kata",) for c in s)


def nfkc(s: str) -> str:
    return unicodedata.normalize("NFKC", s)
