"""Exploration: diff our tokenizer's per-article positions against the
reference's golden FLI expectations (test_crawl.py:856-1653).

For each golden query term, print per-article: golden positions vs the
positions our tokenize_ja_text emits for that term (term == base form).
No Spark — pure-Python tokenizer run over the golden full_texts.
"""

from __future__ import annotations

import ast
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from golden import REF_TEST  # noqa: E402

from myaku_spark.functions.tokenize import tokenize_ja_text  # noqa: E402


def _const(node):
    return node.value if isinstance(node, ast.Constant) else None


def _fli_doc(d: ast.Dict) -> dict:
    out = {}
    for k, v in zip(d.keys, d.values):
        key = _const(k)
        if key == "article_oid":
            out["title"] = _const(v)
        elif key == "found_positions" and isinstance(v, ast.List):
            poss = []
            for e in v.elts:
                if isinstance(e, ast.Dict):
                    p = {_const(pk): _const(pv) for pk, pv in zip(e.keys, e.values)}
                    poss.append((p["index"], p["len"]))
            out["positions"] = poss
        elif key == "possible_interps" and isinstance(v, ast.List):
            srcs = []
            for e in v.elts:
                if isinstance(e, ast.Dict):
                    for pk, pv in zip(e.keys, e.values):
                        if _const(pk) == "interp_sources" and isinstance(pv, ast.List):
                            srcs.append(tuple(_const(x) for x in pv.elts))
            out["interp_sources"] = srcs
    return out


def load_golden_flis() -> dict[str, list[dict]]:
    """term -> [{title, positions, interp_sources}] merged initial+update."""
    tree = ast.parse(open(REF_TEST, encoding="utf-8").read())
    flis: dict[str, list[dict]] = {}
    for node in ast.walk(tree):
        # INITIAL_CRAWL_EXPECTED_FLI_QUERY_DOCS = { term: [docs] }
        if isinstance(node, ast.Assign) and node.targets:
            name = getattr(node.targets[0], "id", None)
            if name == "INITIAL_CRAWL_EXPECTED_FLI_QUERY_DOCS" and isinstance(
                node.value, ast.Dict
            ):
                for k, v in zip(node.value.keys, node.value.values):
                    term = _const(k)
                    flis[term] = [
                        _fli_doc(e) for e in v.elts if isinstance(e, ast.Dict)
                    ]
            # UPDATE_..._FLI_QUERY_DOCS['term'] = [docs]
            t0 = node.targets[0]
            if (
                isinstance(t0, ast.Subscript)
                and getattr(t0.value, "id", None)
                == "UPDATE_CRAWL_EXPECTED_FLI_QUERY_DOCS"
                and isinstance(node.value, ast.List)
            ):
                term = _const(t0.slice)
                flis.setdefault(term, [])
                flis[term].extend(
                    _fli_doc(e) for e in node.value.elts if isinstance(e, ast.Dict)
                )
        # UPDATE_..._FLI_QUERY_DOCS['term'].append({doc})
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "append"
            and isinstance(node.func.value, ast.Subscript)
            and getattr(node.func.value.value, "id", None)
            == "UPDATE_CRAWL_EXPECTED_FLI_QUERY_DOCS"
            and node.args
            and isinstance(node.args[0], ast.Dict)
        ):
            term = _const(node.func.value.slice)
            flis.setdefault(term, [])
            flis[term].append(_fli_doc(node.args[0]))
    return flis


def load_article_texts() -> dict[str, str]:
    """title -> full_text for initial+update article docs."""
    tree = ast.parse(open(REF_TEST, encoding="utf-8").read())
    texts: dict[str, str] = {}

    def grab(list_node):
        for elt in list_node.elts:
            if not isinstance(elt, ast.Dict):
                continue
            d = {}
            for k, v in zip(elt.keys, elt.values):
                key = _const(k)
                if key in ("title", "full_text"):
                    d[key] = _const(v)
            if "title" in d and "full_text" in d:
                texts[d["title"]] = d["full_text"]

    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and node.targets:
            name = getattr(node.targets[0], "id", None)
            if name == "INITIAL_CRAWL_EXPECTED_ARTICLE_DOCS" and isinstance(
                node.value, ast.List
            ):
                grab(node.value)
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "extend"
            and getattr(node.func.value, "id", None)
            == "UPDATE_CRAWL_EXPECTED_ARTICLE_DOCS"
            and node.args
            and isinstance(node.args[0], ast.List)
        ):
            grab(node.args[0])
    return texts


def main() -> None:
    flis = load_golden_flis()
    texts = load_article_texts()
    print(f"golden terms: {sorted(flis)}")
    print(f"articles with text: {len(texts)}")

    tok_cache: dict[str, dict[str, set]] = {}

    def positions_of(title: str, term: str) -> set:
        if title not in tok_cache:
            toks = tokenize_ja_text(texts[title])
            by_term: dict[str, set] = {}
            for t in toks:
                by_term.setdefault(t["term"], set()).add((t["start"], t["length"]))
            tok_cache[title] = by_term
        return tok_cache[title].get(term, set())

    n_ok = n_bad = 0
    # Full-corpus sweep: for every golden term, check EVERY article —
    # golden FLI docs are exhaustive, so absence elsewhere matters too.
    for term, docs in sorted(flis.items()):
        want_by_title = {d["title"]: set(d["positions"]) for d in docs}
        for title in sorted(texts):
            want = want_by_title.get(title, set())
            got = positions_of(title, term)
            if want == got:
                if want:
                    n_ok += 1
                    print(f"OK  {term!r} @ {title}: {sorted(want)}")
                continue
            n_bad += 1
            print(f"DIFF {term!r} @ {title}: want={sorted(want)} got={sorted(got)}")
            text = texts[title]
            occ = []
            i = text.find(term)
            while i >= 0:
                occ.append(i)
                i = text.find(term, i + 1)
            print(f"     substring occurrences: {occ}")
    print(f"\n{n_ok} OK / {n_bad} DIFF")


if __name__ == "__main__":
    main()
