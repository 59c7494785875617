"""JMdict XML parser (functions/jmdict_xml.py): reference load-path
parity — one entry per representation element, sense merge with
stagk/stagr restriction and later-sense overwrite, malformed-XML
rejection, and the lookup maps + max-length stats built from the
parsed stream (japanese_analysis.py:570-787)."""

import pytest

from myaku_spark.functions.ja_lexicon import JaDictionary, default_dictionary
from myaku_spark.functions.jmdict_xml import (
    DEFAULT_FRAGMENT,
    parse_jmdict_xml,
)


def test_fragment_parses_to_repr_entries():
    entries = parse_jmdict_xml(DEFAULT_FRAGMENT)
    by_id = {}
    for e in entries:
        by_id.setdefault(e.entry_id, []).append(e)
    # だから: reading-only entry with priority + sense merged onto it.
    daka = by_id["1007310"]
    assert [e.text_form for e in daka] == ["だから"]
    assert daka[0].parts_of_speech == ("conjunction",)
    assert daka[0].text_form_freq == ("ichi1",)
    assert "word usually written using kana alone" in daka[0].misc
    # 雪曇り: TWO kanji forms + one reading → three repr entries, all
    # carrying the same sense data (the reference emits one JMdictEntry
    # per k_ele/r_ele).
    yuki = by_id["2098190"]
    assert sorted(e.text_form for e in yuki) == ["ゆきぐもり", "雪曇", "雪曇り"]
    assert all(e.parts_of_speech == ("noun (common) (futsuumeishi)",)
               for e in yuki)


def test_sense_restriction_and_overwrite():
    xml = """<?xml version="1.0" encoding="UTF-8"?>
<JMdict>
<entry>
<ent_seq>9000001</ent_seq>
<k_ele><keb>甲</keb></k_ele>
<k_ele><keb>乙</keb></k_ele>
<sense><pos>noun</pos><field>law</field></sense>
<sense><stagk>甲</stagk><pos>prefix</pos></sense>
</entry>
</JMdict>"""
    a, b = parse_jmdict_xml(xml)
    # Second sense applies only to 甲 (stagk) and OVERWRITES its pos —
    # _add_sense_data parity (japanese_analysis.py:630-644).
    assert a.text_form == "甲" and a.parts_of_speech == ("prefix",)
    assert b.text_form == "乙" and b.parts_of_speech == ("noun",)
    assert b.fields == ("law",)
    # 甲's fields were overwritten by the restricted sense (empty tuple).
    assert a.fields == ()


@pytest.mark.parametrize(
    "bad",
    [
        "<JMdict><entry><k_ele><keb>x</keb></k_ele></entry></JMdict>",  # no ent_seq
        "<JMdict><entry><ent_seq>1</ent_seq><k_ele></k_ele></entry></JMdict>",  # no keb
        "<JMdict><entry><ent_seq>1</ent_seq><bogus/></entry></JMdict>",  # unknown tag
        "<JMdict><entry><ent_seq>1</ent_seq><r_ele><reb></reb></r_ele></entry></JMdict>",  # empty text
    ],
)
def test_malformed_xml_raises(bad):
    with pytest.raises(ValueError, match="Malformed JMdict XML"):
        parse_jmdict_xml(bad)


def test_lexicon_builds_maps_from_xml():
    d = default_dictionary()
    jm = d.jmdict
    # entry_map keyed by text form, values (entry_id, text_form).
    assert ("1007310", "だから") in jm.entry_map["だから"]
    assert ("2098190", "雪曇り") in jm.entry_map["雪曇り"]
    assert ("1401460", "窓枠") in jm.entry_map["窓枠"]
    assert ("2765450", "美しさ") in jm.entry_map["美しさ"]
    # Reading representations land under their own keys (the reference
    # indexes every repr's text form).
    assert "まどわく" in jm.entry_map
    # decomp map keyed by OUR tokenizer's base decomposition of the text
    # form (the _get_mecab_decomb analog).
    assert ("2098190", "雪曇り") in jm.decomp_map[("雪", "曇る")]
    assert ("1401460", "窓枠") in jm.decomp_map[("窓", "枠")]
    assert ("2765450", "美しさ") in jm.decomp_map[("美しい", "さ")]
    # Max-length stats gate the meta scan (_set_max_entry_lens parity).
    assert jm.max_text_form_len >= 5  # ゆきぐもり
    assert jm.max_decomp_len >= 2


def test_custom_xml_path_overrides_fragment(tmp_path):
    p = tmp_path / "mini.xml"
    p.write_text(
        "<JMdict><entry><ent_seq>7</ent_seq>"
        "<k_ele><keb>窓枠</keb></k_ele>"
        "<sense><pos>n</pos></sense></entry></JMdict>",
        encoding="utf-8",
    )
    d = JaDictionary(jmdict_xml_path=str(p))
    assert list(d.jmdict.entry_map) == ["窓枠"]
    assert d.jmdict.entry_map["窓枠"] == [("7", "窓枠")]
