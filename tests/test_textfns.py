"""Scalar text function parity tests (P7/P8/P12), mirroring the
reference's own unit coverage (myaku/tests/unit/test_utils.py:104-313)."""

import hashlib

from myaku_spark.functions.textfns import (
    alnum_count_py,
    find_sentence_end,
    find_sentence_start,
    text_hash_py,
    unique_preserving,
)


def test_alnum_count_basic():
    assert alnum_count_py("abc123") == 6
    assert alnum_count_py("a b,c!") == 3
    assert alnum_count_py("") == 0


def test_alnum_count_unicode():
    # Japanese chars are alnum per str.isalnum; punctuation is not.
    assert alnum_count_py("桜の森。") == 3
    assert alnum_count_py("ＡＢ１２") == 4


def test_alnum_udf_regex_matches_python_loop():
    """The vectorized ``[^\\W_]`` count inside alnum_count_udf must equal
    the per-char ``str.isalnum`` loop on any input (Python ``\\w`` is
    documented as isalnum + underscore): random unicode soup across the
    BMP/SMP plus known edge classes (No digits, Lo ideographs, marks,
    surrogate-pair emoji, underscores, whitespace oddballs, None)."""
    import random

    import pandas as pd

    rng = random.Random(1234)
    cases = [
        "", "_x_", "²³¼", "〇一二三", "ｱｲｳ", "🎌🗾", "µº", "\t\n\x0b ",
        "áé", None,
    ]
    for _ in range(500):
        n = rng.randint(0, 40)
        cases.append("".join(chr(rng.randint(1, 0x2FFFF)) for _ in range(n)))
    ser = pd.Series(cases)
    got = ser.str.count(r"[^\W_]").astype("Int64")
    for s, g in zip(cases, got):
        if s is None:
            assert g is pd.NA
        else:
            assert int(g) == alnum_count_py(s), repr(s)


def test_text_hash():
    s = "吾輩は猫である。"
    assert text_hash_py(s) == hashlib.sha256(s.encode("utf-8")).hexdigest()
    assert len(text_hash_py("")) == 64


def test_sentence_start_basic():
    text = "一文目。二文目。三文目。"
    assert find_sentence_start(text, 0) == 0
    assert find_sentence_start(text, 5) == 4  # inside 二文目
    assert find_sentence_start(text, 9) == 8


def test_sentence_start_consecutive_enders():
    text = "えっ？！そうなの。"
    # pos on the second ender walks left past consecutive enders.
    assert find_sentence_start(text, 3) == 0
    assert find_sentence_start(text, 5) == 4


def test_sentence_end_basic():
    text = "一文目。二文目。"
    assert find_sentence_end(text, 0) == 3
    assert find_sentence_end(text, 4) == 7


def test_sentence_end_consecutive_enders():
    text = "なに？！それは。"
    assert find_sentence_end(text, 0) == 3  # extends through ？！
    text2 = "おわりなし"
    assert find_sentence_end(text2, 0) == len(text2) - 1


def test_unique_preserving():
    assert unique_preserving([3, 1, 3, 2, 1]) == [3, 1, 2]
    assert unique_preserving([]) == []
