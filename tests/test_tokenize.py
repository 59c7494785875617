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
    # A lexicon entry spanning two script runs is emitted as a meta item
    # with source 3 (T4 analog: JMdict surface-form lookup).
    lex = {"雪曇り"}
    toks = tokenize_ja_text("朝は雪曇りだった", lexicon=lex)
    metas = [t for t in toks if t.get("sources") == [3]]
    assert any(t["surface"] == "雪曇り" for t in metas)
    m = next(t for t in metas if t["surface"] == "雪曇り")
    assert "朝は雪曇りだった"[m["start"] : m["start"] + m["length"]] == "雪曇り"


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
