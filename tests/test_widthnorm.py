"""Width normalization parity tests (P6).

Expected values follow jaconv's documented behavior for
h2z(kana=True) + z2h(ascii=True, digit=True) — the exact composition the
reference applies (utils/__init__.py:415-423).
"""

from myaku_spark.functions.widthnorm import (
    h2z_kana,
    normalize_char_width,
    z2h_ascii_digit,
)


def test_halfwidth_katakana_to_fullwidth():
    assert h2z_kana("ｶﾀｶﾅ") == "カタカナ"
    assert h2z_kana("ｱｲｳｴｵ") == "アイウエオ"


def test_voiced_mark_merging():
    assert h2z_kana("ｶﾞｷﾞｸﾞ") == "ガギグ"
    assert h2z_kana("ﾊﾟﾋﾟﾌﾟ") == "パピプ"
    assert h2z_kana("ｳﾞ") == "ヴ"
    # Orphan sound mark maps to the standalone full-width mark.
    assert h2z_kana("ﾞ") == "゛"
    # Non-combinable base + mark stays separate.
    assert h2z_kana("ｱﾞ") == "ア゛"


def test_halfwidth_punctuation():
    assert h2z_kana("｡｢｣､･ｰ") == "。「」、・ー"


def test_fullwidth_ascii_to_halfwidth():
    assert z2h_ascii_digit("ＡＢＣａｂｃ") == "ABCabc"
    assert z2h_ascii_digit("１２３") == "123"
    assert z2h_ascii_digit("！？＃") == "!?#"
    assert z2h_ascii_digit("　") == " "


def test_fullwidth_kana_untouched_by_z2h():
    assert z2h_ascii_digit("カタカナひらがな漢字") == "カタカナひらがな漢字"


def test_composition():
    assert normalize_char_width("ﾃｽﾄＴＥＳＴ１２３ｶﾞ") == "テストTEST123ガ"
    # Hiragana and kanji pass through unchanged.
    assert normalize_char_width("雪曇り・ｳｨﾝﾄﾞｳ０９") == "雪曇り・ウィンドウ09"


def test_idempotent():
    s = normalize_char_width("ﾃｽﾄＡ１ｶﾞ゛")
    assert normalize_char_width(s) == s
