"""Generate myaku_spark/functions/ipadic_fragment.csv from the builtin
lexicon tables, then assert the compiled word layer is IDENTICAL.

The fragment is the curated vocabulary (ja_lexicon.py builtin tables —
the golden-parity word set) re-expressed in ipadic dictionary-CSV
format so the default tokenizer loads its word layer from data. Run
after editing the builtin tables:

    python scripts/gen_ipadic_fragment.py

Conjugated surfaces are emitted one row per form with authentic ipadic
活用形 labels (基本形 / 連用形 / 連用タ接続 / 未然形 / 仮定形 /
未然ウ接続 / 連用テ接続 / ガル接続); the ガル接続 stem row plus the
名詞-接尾-特殊 さ row reproduce the さ-nominal composite (美しさ)
through ipadic_csv.word_layer_from_rows' compile-time composition.
Costs encode builtin first-wins precedence (earlier table → lower
cost); context ids are synthetic (the regex tokenizer does not use
connection costs).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from myaku_spark.functions import ja_lexicon as L  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.abspath(L.__file__)), "ipadic_fragment.csv"
)

# Readings (katakana) for the kanji vocabulary; kana surfaces convert
# mechanically. Reading/pron are carried for format authenticity only.
READINGS = {
    "雪": "ユキ", "窓": "マド", "枠": "ワク", "戦争": "センソウ",
    "未亡人": "ミボウジン", "吾輩は猫である": "ワガハイハネコデアル",
    "曇": "クモ", "美し": "ウツクシ",
}

# 五段・ラ行 suffix → ipadic 活用形 label (れ doubles as 命令ｅ; the
# 仮定形 label is kept — the tokenizer does not consume the form).
GODAN_RA_FORMS = [
    ("る", "基本形"), ("り", "連用形"), ("っ", "連用タ接続"),
    ("ら", "未然形"), ("れ", "仮定形"), ("ろ", "未然ウ接続"),
]
ADJ_FORMS = [
    ("い", "基本形"), ("く", "連用テ接続"), ("かっ", "連用タ接続"),
    ("けれ", "仮定形"),
]


def kana_reading(s: str) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        out.append(chr(o + 0x60) if 0x3041 <= o <= 0x3096 else ch)
    return "".join(out)


def pos_fields(pos: str) -> list[str]:
    parts = pos.split("-")
    return parts + ["*"] * (4 - len(parts))


def main() -> None:
    rows: list[list[str]] = []
    cost = 1000

    def emit(surface, pos, ctype, cform, base, reading):
        nonlocal cost
        rows.append(
            [surface, "1285", "1285", str(cost)]
            + pos_fields(pos)
            + [ctype or "*", cform or "*", base, reading, reading]
        )
        cost += 10

    # 1. NEologd-style entities (builtin precedence: first).
    for surface, pos in L.ENTITY_ENTRIES:
        emit(surface, pos, None, None, surface, READINGS[surface])

    # 2. Word entries, one row per conjugated form.
    for base, pos, conj in L.WORD_ENTRIES:
        if conj is None:
            emit(base, pos, None, None, base,
                 READINGS.get(base, kana_reading(base)))
        elif conj == "五段・ラ行":
            stem = base[:-1]
            rd = READINGS[stem]
            for suf, form in GODAN_RA_FORMS:
                emit(stem + suf, pos, conj, form, base,
                     rd + kana_reading(suf))
        elif conj == "形容詞・アウオ段":
            stem = base[:-1]
            rd = READINGS[stem]
            for suf, form in ADJ_FORMS:
                emit(stem + suf, pos, conj, form, base,
                     rd + kana_reading(suf))
            emit(stem, pos, conj, "ガル接続", base, rd)
        else:
            raise ValueError(f"unknown conjugation type: {conj}")

    # 3. The 名詞-接尾-特殊 suffix that binds ガル接続 stems.
    emit("さ", "名詞-接尾-特殊", None, None, "さ", "サ")

    # 4. Function words (builtin precedence: last).
    for w in L.JA_FUNCTION_WORDS:
        pos = L._FW_POS_OVERRIDES.get(w, "助詞")
        # Authentic POS for the two lattice-context conjunction
        # surfaces (pieces come from CONJUNCTION_RULES either way).
        if w == "だから":
            pos = "接続詞"
        elif w == "けれども":
            pos = "助詞-接続助詞"
        emit(w, pos, None, None, w, kana_reading(w))

    with open(OUT, "w", encoding="utf-8", newline="") as f:
        f.write("\n".join(",".join(r) for r in rows) + "\n")
    print(f"wrote {OUT}: {len(rows)} rows")

    # Equivalence gate: compiled CSV layer == builtin-table layer.
    from myaku_spark.functions.ipadic_csv import (
        parse_ipadic_csv,
        word_layer_from_rows,
    )

    csv_map, conj_map = word_layer_from_rows(parse_ipadic_csv(OUT))
    builtin_map = L.builtin_surface_map()
    # CONJUNCTION_RULES surfaces: piece values come from the rules, the
    # map value only provides regex membership — compare keys there.
    assert set(csv_map) == set(builtin_map), (
        sorted(set(csv_map) ^ set(builtin_map))
    )
    diff = {
        s: (csv_map[s], builtin_map[s])
        for s in builtin_map
        if s not in L.CONJUNCTION_RULES and csv_map[s] != builtin_map[s]
    }
    assert not diff, diff
    print(f"equivalence OK: {len(csv_map)} surfaces, "
          f"{len(conj_map)} conjugation-tagged rows")


if __name__ == "__main__":
    main()
