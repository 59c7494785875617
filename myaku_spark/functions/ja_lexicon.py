"""Curated Japanese word dictionary + JMdict subset for the tokenizer.

Plays the role of MeCab's ipadic-NEologd dictionary and the JMdict XML
load in the reference (japanese_analysis.py:424-916), re-expressed as a
small, versioned, deterministic lexicon since MeCab/JMdict are not
installable in this environment. The *mechanisms* mirror the reference
exactly; the *content* is a curated subset:

- Word entries (base form, fine POS, conjugation type) are expanded into
  surface forms via ipadic-style conjugation tables (public knowledge),
  so conjugated surfaces map back to their base form — the reference's
  base_form field from MeCab chasen output (japanese_analysis.py:1090).
- Entity entries are NEologd-style long named entities matched
  longest-first before any decomposition (e.g. 吾輩は猫である, which
  NEologd tokenizes as one item, hiding the embedded 吾輩).
- Sentence-initial conjunction rule: MeCab's lattice tags だから as
  接続詞 at sentence starts but splits it into だ+から mid-sentence
  (observed in the reference's golden FLI expectations,
  test_crawl.py:1104-1203: interp sources [1] vs [3,4]); けれども
  analogously flips 接続詞 → 助詞-接続助詞. The rule here: a match is
  sentence-initial iff at block start or preceded by a symbol/space.
- JMdict subset: entries (entry_id, text_form) with the reference's two
  lookup maps — entry_map keyed by text form and mecab_decomp_map keyed
  by the tuple of base forms our own tokenizer produces for the text
  form in isolation (the exact analog of JMdict._get_mecab_decomb,
  japanese_analysis.py:766-771).

The dictionary content is part of the index contract and versioned
(JA_LEXICON_VERSION); rebuilding with a different version invalidates
segments, matching the reference's resource-version pinning
(japanese_analysis.py:50-66).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

JA_LEXICON_VERSION = "builtin-dict-4-ipadic-csv"

# ---------------------------------------------------------------------------
# Token piece: one dictionary-attested token (surface slice, base form, POS).
# POS uses '-'-joined ipadic-style part hierarchies ('助詞-接続助詞').
# ---------------------------------------------------------------------------
Piece = tuple  # (surface, base, pos)


# ---------------------------------------------------------------------------
# Function words / auxiliaries (closed class). pos tags are coarse ipadic
# analogs; base == surface unless the entry says otherwise (the な entry
# bakes in the reference's _ADJUST_TAGS_MAP な→だ→な fix,
# japanese_analysis.py:934-940: MeCab gives base だ, the reference adjusts
# it back to な, so the net contract is base な).
# ---------------------------------------------------------------------------
JA_FUNCTION_WORDS = [
    "けれども", "だから", "しかし", "そして", "ところが", "それでも",
    "ですから", "ながら", "について", "における", "によって", "として",
    "という", "ばかり", "など", "だけ", "でも", "から", "まで",
    "より", "ほど", "でした", "ました", "ません", "ている", "ていた",
    "です", "ます", "した", "ない", "なら", "ので", "のに", "こと",
    "もの", "それ", "これ", "あれ", "ここ", "そこ", "は", "が", "を",
    "に", "で", "と", "も", "の", "へ", "や", "か", "な", "だ", "た",
    "て", "し", "う", "よ", "ね", "ぞ",
]

_FW_POS_OVERRIDES = {
    "です": "助動詞", "ます": "助動詞", "でした": "助動詞",
    "ました": "助動詞", "ません": "助動詞", "だ": "助動詞",
    "な": "助動詞", "た": "助動詞", "ない": "助動詞",
    "こと": "名詞-非自立-一般", "もの": "名詞-非自立-一般",
    "それ": "名詞-代名詞-一般", "これ": "名詞-代名詞-一般",
    "あれ": "名詞-代名詞-一般", "ここ": "名詞-代名詞-一般",
    "そこ": "名詞-代名詞-一般",
    "しかし": "接続詞", "そして": "接続詞", "ところが": "接続詞",
    "それでも": "接続詞", "ですから": "接続詞",
}

# Sentence-initial conjunction rule: surface → (initial_pieces,
# medial_pieces). Initial = block start or after symbol/space.
CONJUNCTION_RULES: dict[str, tuple[tuple[Piece, ...], tuple[Piece, ...]]] = {
    "だから": (
        (("だから", "だから", "接続詞"),),
        (("だ", "だ", "助動詞"), ("から", "から", "助詞-接続助詞")),
    ),
    "けれども": (
        (("けれども", "けれども", "接続詞"),),
        (("けれども", "けれども", "助詞-接続助詞"),),
    ),
}

# ---------------------------------------------------------------------------
# Content words with conjugation expansion (ipadic conjugation tables).
# (base, pos, conj_type). conj_type None = uninflected (nouns etc.).
# ---------------------------------------------------------------------------
WORD_ENTRIES: list[tuple[str, str, str | None]] = [
    ("雪", "名詞-一般", None),
    ("窓", "名詞-一般", None),
    ("枠", "名詞-一般", None),
    ("戦争", "名詞-サ変接続", None),
    ("未亡人", "名詞-一般", None),
    ("曇る", "動詞-自立", "五段・ラ行"),
    ("美しい", "形容詞-自立", "形容詞・アウオ段"),
]

# NEologd-style long entities: one token, never decomposed.
ENTITY_ENTRIES: list[tuple[str, str]] = [
    ("吾輩は猫である", "名詞-固有名詞-一般"),
]

# JMdict content now comes from a JMdict-FORMAT XML file parsed by
# functions/jmdict_xml.py (the packaged jmdict_fragment.xml carries the
# curated entries, ids matching the reference's golden expectations,
# test_crawl.py:1104-1653) — a full JMdict file is a data drop-in.


def _expand_conjugations(base: str, pos: str, conj: str | None):
    """Yield (surface, pieces) for every conjugated surface of a word.

    ipadic conjugation rows (public tables), minimal set:
    - 五段・ラ行 Xる: Xる/Xり/Xっ/Xら/Xれ/Xろ, all base Xる.
    - 形容詞 Xい: Xい/Xく/Xかっ/Xけれ base Xい, plus the さ-nominal
      compound Xさ which MeCab emits as two tokens X (base Xい) + さ
      (名詞-接尾; the 美しさ golden decomp, test_crawl.py:1590-1604).
    """
    if conj is None:
        yield base, ((base, base, pos),)
        return
    if conj == "五段・ラ行":
        stem = base[:-1]
        for suf in ("る", "り", "っ", "ら", "れ", "ろ"):
            s = stem + suf
            yield s, ((s, base, pos),)
        return
    if conj == "形容詞・アウオ段":
        stem = base[:-1]
        for suf in ("い", "く", "かっ", "けれ"):
            s = stem + suf
            yield s, ((s, base, pos),)
        yield stem + "さ", (
            (stem, base, pos),
            ("さ", "さ", "名詞-接尾-特殊"),
        )
        return
    raise ValueError(f"unknown conjugation type: {conj}")


@dataclass
class JMdictSubset:
    """Reference JMdict twin: entry/text-form map + MeCab-decomp map
    (japanese_analysis.py:750-780) over the curated entry subset.

    ``prefixes`` / ``decomp_heads`` power the meta-scan fast path: a
    span starting at token t can only match an entry if t.surface or
    t.base is a prefix of some text form (surface/base concat lookups)
    or t.base heads some decomp key — positions failing all three are
    skipped without forming any span."""

    entry_map: dict[str, list[tuple[str, str]]] = field(default_factory=dict)
    decomp_map: dict[tuple, list[tuple[str, str]]] = field(default_factory=dict)
    prefixes: set = field(default_factory=set)
    decomp_heads: set = field(default_factory=set)
    max_text_form_len: int = 0
    max_decomp_len: int = 0

    def add(self, entry_id: str, text_form: str, decomp: tuple) -> None:
        ent = (entry_id, text_form)
        self.entry_map.setdefault(text_form, []).append(ent)
        self.decomp_map.setdefault(decomp, []).append(ent)
        for i in range(1, len(text_form) + 1):
            self.prefixes.add(text_form[:i])
        if decomp:
            self.decomp_heads.add(decomp[0])
        self.max_text_form_len = max(self.max_text_form_len, len(text_form))
        self.max_decomp_len = max(self.max_decomp_len, len(decomp))


def builtin_surface_map(
    extra_words: list[tuple[str, str, str | None]] | None = None,
) -> dict[str, tuple]:
    """Word layer from the builtin tables (entity → word → function-word
    precedence via setdefault). This is the generator source for the
    packaged ipadic_fragment.csv (scripts/gen_ipadic_fragment.py) and
    the equivalence baseline for the CSV parse path."""
    surface_map: dict[str, tuple[Piece, ...]] = {}
    for surface, pos in ENTITY_ENTRIES:
        surface_map[surface] = ((surface, surface, pos),)
    for base, pos, conj in list(WORD_ENTRIES) + list(extra_words or []):
        for surface, pieces in _expand_conjugations(base, pos, conj):
            surface_map.setdefault(surface, pieces)
    for w in JA_FUNCTION_WORDS:
        pos = _FW_POS_OVERRIDES.get(w, "助詞")
        surface_map.setdefault(w, ((w, w, pos),))
    return surface_map


class JaDictionary:
    """Compiled dictionary: longest-first surface regex + piece map +
    JMdict subset. Immutable after construction; safe to ship in a UDF
    closure (broadcast once per executor, J6).

    Word-layer sources (T2/T6 — the MeCab ipadic-NEologd analog):
    by default the packaged ipadic-format CSV fragment is parsed by
    functions/ipadic_csv.py, so a real ipadic/NEologd dictionary is a
    data drop-in: ``JaDictionary(ipadic_csv_path='/path/to/neologd.csv')``
    (a list of CSVs works too). ``use_builtin_words=True`` compiles the
    in-code tables instead (the fragment's generator source). The JMdict
    layer is likewise a file swap via ``jmdict_xml_path``.
    """

    def __init__(
        self,
        extra_jmdict_surfaces: set[str] | None = None,
        extra_words: list[tuple[str, str, str | None]] | None = None,
        jmdict_xml_path: str | None = None,
        ipadic_csv_path: str | list[str] | None = None,
        use_builtin_words: bool = False,
    ) -> None:
        self.version = JA_LEXICON_VERSION
        if use_builtin_words:
            surface_map = builtin_surface_map(extra_words)
            self.conj_map: dict[tuple, tuple] = {}
            self.word_source = "builtin-tables"
        else:
            from myaku_spark.functions.ipadic_csv import (
                default_fragment_bytes,
                parse_ipadic_csv,
                word_layer_from_rows,
            )

            if ipadic_csv_path is None:
                # Zip-safe: the packaged fragment is read through the
                # import machinery, not a filesystem path — executors
                # importing from a --py-files zip construct the default
                # dictionary inside mapInPandas and a path relative to
                # __file__ would point into the archive.
                paths = ("ipadic_fragment.csv", default_fragment_bytes())
            else:
                paths = ipadic_csv_path
            surface_map, self.conj_map = word_layer_from_rows(
                parse_ipadic_csv(paths)
            )
            # extra_words OVERRIDE the parsed layer: the builtin path
            # inserts word entries before function words (so an extra
            # word's conjugated surface beats a function-word surface),
            # and the flattened CSV can't replay that order — explicit
            # override keeps the two word sources tokenizing alike.
            # (A collision between an extra word and an existing word/
            # entity row resolves to the extra word here, vs first-wins
            # on the builtin path — callers adding surfaces the packaged
            # layer already covers own that choice.)
            for base, pos, conj in extra_words or []:
                for surface, pieces in _expand_conjugations(base, pos, conj):
                    surface_map[surface] = pieces
            self.word_source = (
                "packaged:ipadic_fragment.csv"
                if ipadic_csv_path is None
                else paths
            )
            if ipadic_csv_path is not None:
                # Custom dictionary data participates in the version pin
                # (the reference records dictionary versions in its index
                # contract, japanese_analysis.py:50-66).
                h = hashlib.sha256()
                for p in (
                    [paths] if isinstance(paths, (str, tuple)) else paths
                ):
                    # (name, bytes) tuples hash their content directly.
                    h.update(p[1] if isinstance(p, tuple) else
                             open(p, "rb").read())
                self.version = f"{JA_LEXICON_VERSION}+{h.hexdigest()[:12]}"
        # Conjunction-rule surfaces must be regex members regardless of
        # word source; their pieces come from the rules, not the map.
        for s in CONJUNCTION_RULES:
            surface_map.setdefault(s, ((s, s, "助詞"),))

        self.surface_map = surface_map
        self.conjunction_rules = CONJUNCTION_RULES
        self.max_surface_len = max(len(s) for s in surface_map)
        # Surface lengths actually present, longest first: the scanner
        # (tokenize_ja_block) probes only these per position — O(#lens)
        # dict lookups instead of CPython re's O(#alternatives)
        # backtracking alternation, which at real-dictionary scale
        # (50k+ surfaces) dominated the whole tokenize path.
        self.match_lens = tuple(
            sorted({len(s) for s in surface_map}, reverse=True)
        )
        self._regex = None

        # JMdict subset from the XML parse path (jmdict_xml.py): decomp
        # keys computed with THIS dictionary's word layer (same
        # circularity as the reference, where JMdict construction
        # MeCab-parses each entry text form, japanese_analysis.py:766-771).
        from myaku_spark.functions.jmdict_xml import (
            default_fragment_text,
            parse_jmdict_xml,
        )
        from myaku_spark.functions.tokenize import tokenize_ja_block

        self.jmdict = JMdictSubset()
        parsed = parse_jmdict_xml(
            jmdict_xml_path
            if jmdict_xml_path is not None
            else default_fragment_text()
        )
        pairs = [(e.entry_id, e.text_form) for e in parsed] + [
            (None, s) for s in sorted(extra_jmdict_surfaces or ())
        ]
        for entry_id, text_form in pairs:
            toks = tokenize_ja_block(text_form, 0, dictionary=self)
            decomp = tuple(t["base"] for t in toks)
            self.jmdict.add(entry_id, text_form, decomp)

    @property
    def regex(self) -> "re.Pattern":
        """Longest-first alternation over all surfaces (legacy matcher,
        kept for debugging/compat). Lazy — compiling 50k+ alternatives
        costs ~1s and the production scanner never needs it."""
        if self._regex is None:
            self._regex = re.compile(
                "|".join(
                    re.escape(s)
                    for s in sorted(
                        self.surface_map, key=len, reverse=True
                    )
                )
            )
        return self._regex

    def pieces_for(self, surface: str, sentence_initial: bool) -> tuple:
        rule = self.conjunction_rules.get(surface)
        if rule is not None:
            return rule[0] if sentence_initial else rule[1]
        return self.surface_map[surface]


_DEFAULT: JaDictionary | None = None
_EXTRA_CACHE: dict[frozenset, JaDictionary] = {}


def default_dictionary() -> JaDictionary:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = JaDictionary()
    return _DEFAULT


def resolve_dictionary(lexicon) -> JaDictionary:
    """Accept None (builtin), a legacy set of JMdict surface strings
    (added as id-less JMdict entries), or a JaDictionary instance."""
    if lexicon is None:
        return default_dictionary()
    if isinstance(lexicon, JaDictionary):
        return lexicon
    key = frozenset(lexicon)
    if key not in _EXTRA_CACHE:
        _EXTRA_CACHE[key] = JaDictionary(extra_jmdict_surfaces=set(lexicon))
    return _EXTRA_CACHE[key]
