"""Synthesize a full-scale ipadic-format CSV (+ JMdict XML subset) and
measure the dictionary load path at real-dictionary scale.

r4 verdict #3: the word layer's "real ipadic/NEologd = data drop-in"
claim had only been exercised on the 78-row packaged fragment. This
script generates a >=50k-surface dictionary in the SAME CSV format
(deterministic, no randomness) and measures what a 1000-executor
deployment cares about: parse time, compile time (surface map + the
longest-first regex), JMdict cross-tokenization time, resident memory,
and the pickled size a broadcast/UDF-closure ship would pay.

Synthetic surfaces draw from CJK Extension A (U+3400..U+4DBF) — a
block absent from the golden corpus — so the packaged fragment's
tokenization of every golden text is provably unchanged with the big
dictionary active (asserted in tests/test_big_lexicon.py).

Usage:
    python scripts/gen_big_lexicon.py [out_dir] [n_surfaces]
Writes <out>/big_ipadic.csv, <out>/big_jmdict.xml and prints one JSON
metrics line (recorded in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXT_A_BASE = 0x3400
EXT_A_SIZE = 0x4DBF - 0x3400  # 6591 codepoints

KATAKANA = [chr(0x30A2 + i) for i in range(60)]


def surface_for(i: int, length: int) -> str:
    """Deterministic unique CJK-ext-A surface: base-6591 digits of i."""
    chars = []
    x = i
    for _ in range(length):
        chars.append(chr(EXT_A_BASE + x % EXT_A_SIZE))
        x //= EXT_A_SIZE
    return "".join(chars)


def reading_for(i: int) -> str:
    return "".join(KATAKANA[(i >> (4 * j)) % len(KATAKANA)] for j in range(3))


def gen_rows(n_surfaces: int) -> list[str]:
    """CSV rows covering every row class the parser compiles: plain
    nouns, proper nouns with blank base ('*' → surface fallback),
    五段・ラ行 verbs (6 conjugation rows each), 形容詞 with ガル接続
    stems (compose with the 特殊 suffixes), generic 名詞-接尾
    (standalone under the r5 rule), and genuine ambiguity (duplicate
    surfaces at different costs → min-cost winner)."""
    rows: list[str] = []
    i = 0
    while i < n_surfaces:
        s = surface_for(i, 2 + (i % 3))
        r = reading_for(i)
        cost = 3000 + (i * 7) % 5000
        cls = i % 100
        if cls < 80:  # plain noun
            rows.append(f"{s},1285,1285,{cost},名詞,一般,*,*,*,*,{s},{r},{r}")
        elif cls < 85:  # proper noun, blank base (known-problem fix path)
            rows.append(f"{s},1289,1289,{cost},名詞,固有名詞,一般,*,*,*,*,{r},{r}")
        elif cls < 91:  # 五段・ラ行 verb: 6 surface rows, one base
            base = s + "る"
            for suf, form in (
                ("る", "基本形"), ("り", "連用形"), ("っ", "連用タ接続"),
                ("ら", "未然形"), ("れ", "仮定形"), ("ろ", "未然ウ接続"),
            ):
                rows.append(
                    f"{s}{suf},772,772,{cost},動詞,自立,*,*,五段・ラ行,"
                    f"{form},{base},{r},{r}"
                )
        elif cls < 96:  # 形容詞 + ガル接続 stem (composes with さ/み)
            base = s + "い"
            for suf, form in (
                ("い", "基本形"), ("く", "連用テ接続"),
                ("かっ", "連用タ接続"), ("けれ", "仮定形"),
            ):
                rows.append(
                    f"{s}{suf},19,19,{cost},形容詞,自立,*,*,形容詞・アウオ段,"
                    f"{form},{base},{r},{r}"
                )
            rows.append(
                f"{s},19,19,{cost},形容詞,自立,*,*,形容詞・アウオ段,"
                f"ガル接続,{base},{r},{r}"
            )
        elif cls < 98:  # generic 名詞-接尾 (standalone, never composited)
            rows.append(f"{s},1303,1303,{cost},名詞,接尾,一般,*,*,*,{s},{r},{r}")
        else:  # ambiguity: same surface twice, different POS/cost
            rows.append(f"{s},1285,1285,{cost},名詞,一般,*,*,*,*,{s},{r},{r}")
            rows.append(
                f"{s},1283,1283,{cost + 500},名詞,サ変接続,*,*,*,*,{s},{r},{r}"
            )
        i += 1
    # The 特殊 suffixes the ガル stems bind to.
    rows.append("さ,1314,1314,4000,名詞,接尾,特殊,*,*,*,さ,サ,サ")
    rows.append("み,1314,1314,4100,名詞,接尾,特殊,*,*,*,み,ミ,ミ")
    return rows


def gen_jmdict(n_entries: int) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        "<!DOCTYPE JMdict [",
        '<!ENTITY n "noun (common) (futsuumeishi)">',
        "]>",
        "<JMdict>",
    ]
    for j in range(n_entries):
        s = surface_for(j * 100, 2 + (j % 3))  # reuse noun surfaces
        parts.append(
            f"<entry><ent_seq>{9000000 + j}</ent_seq>"
            f"<k_ele><keb>{s}</keb></k_ele>"
            f"<r_ele><reb>{reading_for(j)}</reb></r_ele>"
            "<sense><pos>&n;</pos></sense></entry>"
        )
    parts.append("</JMdict>")
    return "\n".join(parts)


def main() -> None:
    import pickle
    import tracemalloc

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/big_lexicon"
    n_surfaces = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "big_ipadic.csv")
    xml_path = os.path.join(out_dir, "big_jmdict.xml")

    t0 = time.time()
    rows = gen_rows(n_surfaces)
    with open(csv_path, "w", encoding="utf-8") as f:
        f.write("\n".join(rows) + "\n")
    with open(xml_path, "w", encoding="utf-8") as f:
        f.write(gen_jmdict(500))
    gen_sec = time.time() - t0

    from myaku_spark.functions.ipadic_csv import (
        default_fragment_bytes,
        parse_ipadic_csv,
        word_layer_from_rows,
    )
    from myaku_spark.functions.ja_lexicon import JaDictionary

    # Stage timings. The packaged fragment rows go FIRST so the curated
    # vocabulary keeps min-(cost, order) precedence — exactly how a real
    # NEologd drop-in layers over a base dictionary.
    #
    # r7 measurement fix: timings run UNTRACED. tracemalloc was
    # previously active around the timed construct and its allocation
    # hooks inflated the measured time ~5x (6.75 s traced vs 1.3 s
    # untraced on the same box) — no executor runs with tracemalloc, so
    # the traced number measured the instrumentation, not the load an
    # executor pays. Peak memory (the artifact r4 verdict #3 asked for)
    # now comes from a SEPARATE traced construction below.
    sources = [
        ("ipadic_fragment.csv", default_fragment_bytes()),
        csv_path,
    ]
    t0 = time.time()
    parsed = parse_ipadic_csv(sources)
    parse_sec = time.time() - t0
    t0 = time.time()
    smap, cmap = word_layer_from_rows(parsed)
    compile_sec = time.time() - t0
    t0 = time.time()
    d = JaDictionary(ipadic_csv_path=sources, jmdict_xml_path=xml_path)
    dict_total_sec = time.time() - t0
    # Traced twin construct, reported for memory only (its wall time is
    # instrumentation-inflated by design).
    tracemalloc.start()
    JaDictionary(ipadic_csv_path=sources, jmdict_xml_path=xml_path)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    t0 = time.time()
    blob = pickle.dumps(d, protocol=pickle.HIGHEST_PROTOCOL)
    pickle_sec = time.time() - t0

    # Tokenization throughput over text mixing golden + synthetic vocab.
    from myaku_spark.functions.tokenize import tokenize_ja_block

    sample = ("".join(surface_for(k * 37, 2 + k % 3) for k in range(200))
              + "雪が降って、窓の外は美しさに曇った。") * 5
    t0 = time.time()
    n_toks = sum(
        len(tokenize_ja_block(sample, 0, dictionary=d)) for _ in range(3)
    )
    tok_sec = (time.time() - t0) / 3

    print(json.dumps({
        "csv_rows": len(rows),
        "surfaces": len(smap),
        "conj_entries": len(cmap),
        "jmdict_entries": len(d.jmdict.entry_map),
        "gen_sec": round(gen_sec, 2),
        "parse_sec": round(parse_sec, 2),
        "word_layer_compile_sec": round(compile_sec, 2),
        "dict_construct_total_sec": round(dict_total_sec, 2),
        "peak_mem_mb": round(peak / 1e6, 1),
        "pickled_mb": round(len(blob) / 1e6, 1),
        "pickle_sec": round(pickle_sec, 2),
        "tokens_per_sec": round(n_toks / tok_sec, 0) if tok_sec > 0 else None,
        "sample_tokens": n_toks // 3,
    }))


if __name__ == "__main__":
    main()
