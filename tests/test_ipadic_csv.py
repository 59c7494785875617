"""ipadic-CSV word layer: parser unit tests + builtin equivalence.

The default JaDictionary now parses its word layer from the packaged
ipadic-format fragment (functions/ipadic_fragment.csv), making the full
tokenizer a data drop-in (reference: MeCab over ipadic-NEologd,
japanese_analysis.py:919-1013, versions pinned at :50-66). These tests
pin the parser semantics and prove the parsed layer is behaviorally
identical to the builtin tables it was generated from — which is what
keeps the golden FLI parity suite (test_fli_parity.py) meaningful for
the CSV path: that suite runs against the default (CSV-backed)
dictionary.
"""

import pytest

from golden import golden_article_texts

from myaku_spark.functions.ipadic_csv import (
    DEFAULT_FRAGMENT,
    IpadicRow,
    parse_ipadic_csv,
    word_layer_from_rows,
)
from myaku_spark.functions.ja_lexicon import (
    CONJUNCTION_RULES,
    JA_LEXICON_VERSION,
    JaDictionary,
    builtin_surface_map,
)
from myaku_spark.functions.tokenize import tokenize_ja_block


def row(surface, pos="名詞,一般,*,*", ctype="*", cform="*", base=None,
        cost=5000):
    return (
        f"{surface},1285,1285,{cost},{pos},{ctype},{cform},"
        f"{base if base is not None else surface},*,*"
    )


def write_csv(tmp_path, lines, name="d.csv", encoding="utf-8"):
    p = tmp_path / name
    p.write_bytes(("\n".join(lines) + "\n").encode(encoding))
    return str(p)


# --- parser ----------------------------------------------------------------


def test_parse_fields(tmp_path):
    p = write_csv(tmp_path, [
        "走る,772,772,7175,動詞,自立,*,*,五段・ラ行,基本形,走る,ハシル,ハシル",
    ])
    [r] = parse_ipadic_csv(p)
    assert r == IpadicRow(
        surface="走る", left_id=772, right_id=772, cost=7175,
        pos=("動詞", "自立"), conj_type="五段・ラ行", conj_form="基本形",
        base="走る", reading="ハシル", pron="ハシル",
    )
    assert r.pos_joined == "動詞-自立"


def test_blank_base_falls_back_to_surface(tmp_path):
    # The reference's known-problem fix (japanese_analysis.py:1049-1056):
    # rare proper nouns come back with a blank base form.
    p = write_csv(tmp_path, [
        "ミャク,1288,1288,4000,名詞,固有名詞,一般,*,*,*,*,ミャク,ミャク",
    ])
    [r] = parse_ipadic_csv(p)
    assert r.base == "ミャク"


def test_euc_jp_fallback(tmp_path):
    # The original ipadic distribution ships EUC-JP CSVs.
    p = write_csv(
        tmp_path,
        ["雪,1285,1285,5000,名詞,一般,*,*,*,*,雪,ユキ,ユキ"],
        encoding="euc_jp",
    )
    [r] = parse_ipadic_csv(p)
    assert (r.surface, r.base, r.reading) == ("雪", "雪", "ユキ")


def test_malformed_rows_raise(tmp_path):
    with pytest.raises(ValueError, match="expected 13 fields"):
        parse_ipadic_csv(write_csv(tmp_path, ["雪,1,2,3,名詞"]))
    with pytest.raises(ValueError, match="non-integer"):
        parse_ipadic_csv(write_csv(
            tmp_path, ["雪,a,2,3,名詞,一般,*,*,*,*,雪,ユキ,ユキ"]))
    with pytest.raises(ValueError, match="empty surface"):
        parse_ipadic_csv(write_csv(
            tmp_path, [",1,2,3,名詞,一般,*,*,*,*,x,ユキ,ユキ"]))


def test_multi_file_parse_order(tmp_path):
    p1 = write_csv(tmp_path, [row("雪")], name="a.csv")
    p2 = write_csv(tmp_path, [row("窓")], name="b.csv")
    rows = parse_ipadic_csv([p1, p2])
    assert [r.surface for r in rows] == ["雪", "窓"]


# --- word-layer compilation -------------------------------------------------


def test_min_cost_wins_per_surface(tmp_path):
    p = write_csv(tmp_path, [
        row("雪", pos="名詞,一般,*,*", cost=6000),
        row("雪", pos="名詞,固有名詞,一般,*", cost=4000),
    ])
    smap, _ = word_layer_from_rows(parse_ipadic_csv(p))
    assert smap["雪"] == (("雪", "雪", "名詞-固有名詞-一般"),)


def test_equal_cost_first_row_wins(tmp_path):
    p = write_csv(tmp_path, [
        row("雪", pos="名詞,一般,*,*", cost=5000),
        row("雪", pos="名詞,固有名詞,一般,*", cost=5000),
    ])
    smap, _ = word_layer_from_rows(parse_ipadic_csv(p))
    assert smap["雪"] == (("雪", "雪", "名詞-一般"),)


def test_garu_stem_composes_with_suffix_only(tmp_path):
    # ガル接続 stems and 名詞-接尾 suffixes are lattice-context-bound:
    # they appear only through compile-time composites, never standalone.
    p = write_csv(tmp_path, [
        "美し,19,19,5000,形容詞,自立,*,*,形容詞・アウオ段,ガル接続,美しい,ウツクシ,ウツクシ",
        "さ,1314,1314,4000,名詞,接尾,特殊,*,*,*,さ,サ,サ",
    ])
    smap, _ = word_layer_from_rows(parse_ipadic_csv(p))
    assert set(smap) == {"美しさ"}
    assert smap["美しさ"] == (
        ("美し", "美しい", "形容詞-自立"),
        ("さ", "さ", "名詞-接尾-特殊"),
    )


def test_standalone_row_outranks_composition(tmp_path):
    p = write_csv(tmp_path, [
        "美し,19,19,5000,形容詞,自立,*,*,形容詞・アウオ段,ガル接続,美しい,ウツクシ,ウツクシ",
        "さ,1314,1314,4000,名詞,接尾,特殊,*,*,*,さ,サ,サ",
        row("美しさ", pos="名詞,一般,*,*", cost=3000),
    ])
    smap, _ = word_layer_from_rows(parse_ipadic_csv(p))
    assert smap["美しさ"] == (("美しさ", "美しさ", "名詞-一般"),)


def test_conj_map_carries_type_and_form():
    _, conj = word_layer_from_rows(parse_ipadic_csv(DEFAULT_FRAGMENT))
    assert conj[("曇る", "曇る", "動詞-自立")] == ("五段・ラ行", "基本形")
    assert conj[("曇っ", "曇る", "動詞-自立")] == ("五段・ラ行", "連用タ接続")
    assert conj[("美し", "美しい", "形容詞-自立")] == (
        "形容詞・アウオ段", "ガル接続")


# --- builtin equivalence (the FLI-parity bridge) ----------------------------


def test_fragment_layer_equals_builtin_tables():
    smap, _ = word_layer_from_rows(parse_ipadic_csv(DEFAULT_FRAGMENT))
    builtin = builtin_surface_map()
    assert set(smap) == set(builtin)
    for s in builtin:
        if s in CONJUNCTION_RULES:
            continue  # pieces come from the rules, map is membership-only
        assert smap[s] == builtin[s], s


def test_default_dictionary_is_csv_backed():
    d = JaDictionary()
    assert d.word_source.endswith("ipadic_fragment.csv")
    assert d.version == JA_LEXICON_VERSION
    assert d.conj_map  # conjugation tags survive into the dictionary


def test_golden_corpus_tokenization_identical_csv_vs_builtin():
    # Identical token streams modulo the conjugation tags, which only
    # the CSV rows carry (the builtin tables are the tag-free
    # generator source).
    def strip(toks):
        return [
            {k: v for k, v in t.items() if not k.startswith("conj_")}
            for t in toks
        ]

    d_csv = JaDictionary()
    d_builtin = JaDictionary(use_builtin_words=True)
    for title, text in golden_article_texts().items():
        for block in text.split("\n"):
            assert strip(tokenize_ja_block(block, 0, d_csv)) == strip(
                tokenize_ja_block(block, 0, d_builtin)
            ), title


def test_custom_csv_path_pins_version(tmp_path):
    p = write_csv(tmp_path, [row("雪")])
    d = JaDictionary(ipadic_csv_path=p)
    assert d.version.startswith(JA_LEXICON_VERSION + "+")
    assert d.version != JA_LEXICON_VERSION
    assert "雪" in d.surface_map
    # conjunction-rule surfaces stay regex members with any word source
    for s in CONJUNCTION_RULES:
        assert s in d.surface_map


# --- conjugation tags through the tokenizer (MecabLexicalItemInterp
# conjugated_type/form, datatypes.py:329-342) -------------------------------


def test_tokens_carry_conjugation_tags():
    from myaku_spark.functions.tokenize import tokenize_ja_text

    toks = {t["surface"]: t for t in tokenize_ja_text("空が曇った。")}
    t = toks["曇っ"]
    assert (t["base"], t["conj_type"], t["conj_form"]) == (
        "曇る", "五段・ラ行", "連用タ接続"
    )
    # OOV script-run tokens carry no conjugation interp.
    assert toks["空"].get("conj_type") is None


def test_sidecar_has_conjugation_columns(spark):
    from myaku_spark.functions.tokenize import explode_ja_tokens

    docs = spark.createDataFrame(
        [(1, "空が曇った。")], ["doc_id", "text"]
    )
    rows = {
        (r.term, r.start): r
        for r in explode_ja_tokens(
            docs, "text", "doc_id", include_analysis=True
        ).collect()
    }
    got = rows[("曇る", 2)]
    assert (got.conj_type, got.conj_form) == ("五段・ラ行", "連用タ接続")
    assert rows[("空", 0)].conj_type is None


def test_extra_words_precedence_matches_builtin():
    # Review r4: an extra word's conjugated surface must beat a
    # function-word surface on BOTH word sources (builtin inserts word
    # entries before function words; the CSV path overrides).
    extra = [("ある", "動詞-自立", "五段・ラ行")]
    d_csv = JaDictionary(extra_words=extra)
    d_builtin = JaDictionary(use_builtin_words=True, extra_words=extra)
    assert d_csv.surface_map["あれ"] == (("あれ", "ある", "動詞-自立"),)
    assert d_csv.surface_map["あれ"] == d_builtin.surface_map["あれ"]


def test_generic_meishi_setsubi_stands_alone(tmp_path):
    # ADVICE r4: only the 特殊 nominalizing class (さ/み) binds to
    # ガル接続 stems in the ipadic connection matrix. Generic 名詞-接尾
    # rows (さん, 氏, 的 — thousands in a real dictionary) must compile
    # as STANDALONE surfaces, not cross-product composites, or a real
    # NEologd drop-in materializes millions of surface_map keys.
    p = write_csv(tmp_path, [
        "美し,19,19,5000,形容詞,自立,*,*,形容詞・アウオ段,ガル接続,美しい,ウツクシ,ウツクシ",
        "さ,1314,1314,4000,名詞,接尾,特殊,*,*,*,さ,サ,サ",
        "さん,1303,1303,4500,名詞,接尾,人名,*,*,*,さん,サン,サン",
        "的,1305,1305,4600,名詞,接尾,形容動詞語幹,*,*,*,的,テキ,テキ",
    ])
    smap, _ = word_layer_from_rows(parse_ipadic_csv(p))
    assert smap["さん"] == (("さん", "さん", "名詞-接尾-人名"),)
    assert smap["的"] == (("的", "的", "名詞-接尾-形容動詞語幹"),)
    assert "美しさん" not in smap and "美し的" not in smap
    assert smap["美しさ"] == (
        ("美し", "美しい", "形容詞-自立"),
        ("さ", "さ", "名詞-接尾-特殊"),
    )


def test_composite_count_bounded(tmp_path):
    # Cross-product guard: |stems| x |特殊 suffixes| composites, never
    # |stems| x |名詞-接尾 family|.
    lines = []
    for i in range(50):
        lines.append(
            f"堅{chr(0x3042 + i)},19,19,5000,形容詞,自立,*,*,"
            f"形容詞・アウオ段,ガル接続,堅{chr(0x3042 + i)}い,カタ,カタ"
        )
    lines.append("さ,1314,1314,4000,名詞,接尾,特殊,*,*,*,さ,サ,サ")
    lines.append("み,1314,1314,4100,名詞,接尾,特殊,*,*,*,み,ミ,ミ")
    for i in range(40):
        lines.append(
            f"屋{chr(0x30a2 + i)},1303,1303,4500,名詞,接尾,一般,*,*,*,"
            f"屋{chr(0x30a2 + i)},ヤ,ヤ"
        )
    smap, _ = word_layer_from_rows(parse_ipadic_csv(
        write_csv(tmp_path, lines)
    ))
    n_composites = sum(1 for pieces in smap.values() if len(pieces) == 2)
    assert n_composites == 50 * 2  # stems x {さ, み} only


def test_parse_accepts_bytes_tuples():
    # The zip-safe packaged-fragment path hands (name, bytes) instead of
    # a filesystem path.
    from myaku_spark.functions.ipadic_csv import default_fragment_bytes

    rows_path = parse_ipadic_csv(DEFAULT_FRAGMENT)
    rows_bytes = parse_ipadic_csv(
        ("ipadic_fragment.csv", default_fragment_bytes())
    )
    assert rows_bytes == rows_path


def test_default_dictionary_zip_safe(tmp_path):
    # ADVICE r4 (medium): under --py-files deployment __file__ points
    # inside the zip and open() raises — the default word/JMdict layers
    # must load through the import machinery. Import myaku_spark ONLY
    # from a zip in a subprocess and build the default dictionary.
    import os
    import subprocess
    import sys
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "myaku_spark")
    zpath = str(tmp_path / "myaku_spark_zipsafe.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith((".py", ".csv", ".xml")):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]);\n"
        "import myaku_spark.functions.ja_lexicon as L\n"
        "assert 'zipsafe.zip' in L.__file__, L.__file__\n"
        "d = L.JaDictionary()\n"
        "assert d.surface_map['美しさ'][0][1] == '美しい'\n"
        "assert d.jmdict.entry_map, 'jmdict layer empty'\n"
        "print('OK')\n"
    )
    env = dict(os.environ)
    # Drop the repo checkout from any inherited import path so the zip
    # is the only myaku_spark source.
    env["PYTHONPATH"] = ""
    out = subprocess.run(
        [sys.executable, "-c", code, zpath],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "OK"
