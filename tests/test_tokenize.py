"""Tokenizer tests: offset exactness (T1), block-split semantics, symbol
filter (P10), dictionary n-gram meta items (T4), width-normalized term
keys, and the Catalyst whitespace tokenizer."""

from myaku_spark.functions.tokenize import (
    explode_whitespace_tokens,
    tokenize_ja_block,
    tokenize_ja_text,
)


def test_block_offsets_match_reference_semantics():
    # T1 (japanese_analysis.py:186-209): empty block advances offset by 1,
    # non-empty by len+1.
    text = "一行目です。\n\n三行目です。"
    toks = tokenize_ja_text(text)
    # First token of block 2 must start at offset 8 (6 + 1 + 1).
    block2 = [t for t in toks if t["start"] >= 8]
    assert block2, toks
    assert min(t["start"] for t in block2) == 8
    # Every token's surface must slice out of the original text exactly.
    for t in toks:
        assert text[t["start"] : t["start"] + t["length"]] == t["surface"]


def test_symbol_tokens_filtered():
    toks = tokenize_ja_text("猫、犬。")
    surfaces = [t["surface"] for t in toks]
    assert "、" not in surfaces and "。" not in surfaces
    assert "猫" in surfaces and "犬" in surfaces


def test_symbol_tokens_kept_when_requested():
    toks = tokenize_ja_block("猫、犬。", 0)
    assert any(t["pos"] == "記号" for t in toks)


def test_function_word_segmentation():
    toks = tokenize_ja_text("雨だからけれども行く")
    surfaces = [t["surface"] for t in toks]
    assert "だから" in surfaces
    assert "けれども" in surfaces


def test_script_run_segmentation():
    toks = tokenize_ja_text("漢字とカタカナとlatin123")
    surfaces = [t["surface"] for t in toks]
    assert "漢字" in surfaces
    assert "カタカナ" in surfaces
    assert "latin123" in surfaces


def test_dict_ngram_meta_items():
    # A JMdict entry spanning two script runs is emitted as a meta item
    # via the three-key lookup (T4, japanese_analysis.py:318-369):
    # decomp (雪, 曇る) → source 2, surface concat 雪曇り → source 3;
    # base concat 雪曇る misses, so no source 4 (golden interp
    # expectation for 雪曇り, test_crawl.py:1206-1233).
    toks = tokenize_ja_text("朝は雪曇りだった")
    metas = [t for t in toks if t["surface"] == "雪曇り"]
    assert metas, toks
    m = metas[0]
    assert m["sources"] == [2, 3]
    assert m["entry_id"] == "2098190"
    assert m["base"] == "雪曇り"
    assert "朝は雪曇りだった"[m["start"] : m["start"] + m["length"]] == "雪曇り"


def test_jmdict_three_key_sources():
    # 窓枠: decomp (窓, 枠) + surface 窓枠 + base concat 窓枠 → [2, 3, 4]
    # (test_crawl.py:1235-1263).
    toks = tokenize_ja_text("窓枠がある")
    m = next(t for t in toks if t["surface"] == "窓枠")
    assert m["sources"] == [2, 3, 4]
    assert m["entry_id"] == "1401460"
    # 美しさ: MeCab-analog 美し (base 美しい) + さ; decomp (美しい, さ)
    # + surface 美しさ; base concat 美しいさ misses → [2, 3]
    # (test_crawl.py:1577-1647).
    toks = tokenize_ja_text("空の美しさがある")
    m = next(t for t in toks if t["surface"] == "美しさ")
    assert m["sources"] == [2, 3]
    assert m["entry_id"] == "2765450"
    assert m["base"] == "美しさ"


def test_conjunction_context_rule():
    # Sentence-initial だから = 接続詞 single token (source 1); medial
    # だから splits into だ+から and is recovered as a JMdict meta item
    # with sources [3, 4] (golden interp axis, test_crawl.py:1104-1203).
    toks = tokenize_ja_text("そうだ。だから行く")
    m = [t for t in toks if t["surface"] == "だから"]
    assert len(m) == 1 and m[0]["sources"] == [1] and m[0]["pos"] == "接続詞"
    toks = tokenize_ja_text("人間だから行く")
    m = [t for t in toks if t["surface"] == "だから"]
    assert len(m) == 1 and m[0]["sources"] == [3, 4]
    assert m[0]["entry_id"] == "1007310"
    # The split base items are also present.
    assert any(t["surface"] == "だ" and t["base"] == "だ" for t in toks)
    assert any(t["surface"] == "から" for t in toks)


def test_entity_longest_match():
    # NEologd-style entity: 吾輩は猫である is ONE token, so the embedded
    # 吾輩 is NOT indexed at that position (golden 吾輩 expectation,
    # test_crawl.py:1511-1546); standalone 吾輩 still is.
    toks = tokenize_ja_text("吾輩は猫である。名前はまだ無い。")
    assert any(t["surface"] == "吾輩は猫である" for t in toks)
    assert not any(t["surface"] == "吾輩" for t in toks)
    toks = tokenize_ja_text("吾輩はここで待つ")
    assert any(t["surface"] == "吾輩" for t in toks)


def test_base_form_layer():
    # Conjugated surfaces map to their dictionary base form (T2): the
    # posting key is the width-normalized base form.
    toks = tokenize_ja_text("空が曇っている")
    m = next(t for t in toks if t["surface"] == "曇っ")
    assert m["base"] == "曇る" and m["term"] == "曇る"
    toks = tokenize_ja_text("美しく咲く")
    m = next(t for t in toks if t["surface"] == "美しく")
    assert m["base"] == "美しい"
    # T3 analog: な keeps base な (reference _ADJUST_TAGS_MAP,
    # japanese_analysis.py:934-940).
    toks = tokenize_ja_text("静かな森")
    m = next(t for t in toks if t["surface"] == "な")
    assert m["base"] == "な"


def test_term_width_normalized():
    toks = tokenize_ja_text("ﾃｽﾄＡ１")
    terms = {t["term"] for t in toks}
    assert "テストA1" in terms


def test_fast_tokenizer_equals_slow():
    """Regex fast path ≡ per-char reference walk (property test)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from myaku_spark.functions.tokenize import (
        tokenize_ja_block,
        tokenize_ja_block_slow,
    )

    alphabet = st.sampled_from(
        list("漢字猫犬ですますけれどもだからしかのはがをにとカタカナー、。abc12 　ｶﾞ！?ヵヶ々〆ㇰ")
    )

    @given(st.text(alphabet=alphabet, max_size=60))
    @settings(max_examples=300, deadline=None)
    def check(s):
        assert tokenize_ja_block(s, 7) == tokenize_ja_block_slow(s, 7)

    check()


def test_ja_posting_rows_matches_relational_path(spark):
    """Fused doc-local reduce == explode + groupBy posting build."""
    from pyspark.sql import functions as F

    from myaku_spark.functions.tokenize import (
        explode_ja_tokens,
        ja_posting_rows,
    )
    from myaku_spark.operators.postings import build_postings

    rows = [
        (1, "桜の森の満開の下。山賊は桜が怖い。\n\n山賊けれども山賊"),
        (2, "吾輩は猫である。名前はまだ無い。"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fused = {
        (r.doc_id, r.term): (r.tf, list(zip(r.starts, r.lens)))
        for r in ja_posting_rows(df).collect()
    }
    relational = {
        (r.doc_id, r.term): (
            r.tf,
            [(p["start"], p["len"]) for p in r.positions],
        )
        for r in build_postings(explode_ja_tokens(df)).collect()
    }
    assert fused == relational


def test_whitespace_tokens_offsets(spark):
    df = spark.createDataFrame(
        [(1, "ab cd  ef"), (2, "x")], ["doc_id", "text"]
    )
    rows = {
        (r.doc_id, r.term): (r.start, r.len)
        for r in explode_whitespace_tokens(df).collect()
    }
    assert rows[(1, "ab")] == (0, 2)
    assert rows[(1, "cd")] == (3, 2)
    # Double space: empty token advances offset by 1 but is filtered.
    assert rows[(1, "ef")] == (7, 2)
    assert rows[(2, "x")] == (0, 1)


def test_whitespace_tokens_arrow_matches_catalyst_fold(spark):
    """The vectorized mapInArrow kernel must be row-identical to the
    pure-Catalyst aggregate() fold (the oracle-SQL twin) on edge cases:
    multi/leading/trailing spaces, empty string, NULL text, unicode
    (char offsets, not bytes), and a spaces-only string."""
    from pyspark.sql import functions as F

    from myaku_spark.functions.tokenize import tokenize_whitespace_col

    rows = [
        (1, "ab cd  ef"),
        (2, " lead"),
        (3, "trail "),
        (4, ""),
        (5, None),
        (6, "   "),
        (7, "日本 語の テスト"),
        (8, "one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    arrow = explode_whitespace_tokens(df)
    fold = df.select(
        "doc_id", F.explode(tokenize_whitespace_col("text")).alias("t")
    ).select(
        "doc_id",
        F.col("t.tok").alias("term"),
        F.col("t.start").alias("start"),
        F.length("t.tok").alias("len"),
    )
    assert sorted(map(tuple, arrow.collect())) == sorted(
        map(tuple, fold.collect())
    )
