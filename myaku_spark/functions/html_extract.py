"""HTML→text extraction (P1-P5) — the byte-identical per-url invariant.

Per-source article assembly, parity with /root/reference:
- Asahi:    crawlers/asahi.py:339-370 ('\\n\\n'.join([title] + body parts
            from ArticleText div children in {p, h2})), title from the
            single ArticleTitle div's single h1, stripped
            (asahi.py:296-315); paywall pages (TagMember(Gold|Silver)
            class under the title div, asahi.py:44,282-295) yield None.
- Kakuyomu: crawlers/kakuyomu.py:656-685 ('\\n'.join([title.strip(), '']
            + per-<p> texts, empty string for text-less <p>)).
- NHK:      crawlers/nhk_news_web.py:97-171 (title span.contentTitle;
            body divs id∈{news_textbody,news_textmore} then class
            news_add; per-div valid text or '\\n'-joined child texts;
            sections joined '\\n\\n'; ruby tags stripped first,
            nhk_news_web.py:395-402 → utils/html.py:574-585).

Spark surface: ``extract_text_udf`` — an Arrow-batched pandas UDF over
(html binary, source string) returning the extracted text (null when the
page is unparseable/paywalled, which the caller filters — P11).
"""

from __future__ import annotations

import re
from typing import Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from myaku_spark.functions.minidom import (
    Node,
    parse_html,
    parse_valid_child_text,
)

# Ruby-strip regexes (utils/html.py:19-21), applied to the raw HTML.
_RT_CONTENT_REGEX = re.compile(r"<rt.*?>.*?</rt>")
_RP_CONTENT_REGEX = re.compile(r"<rp.*?>.*?</rp>")
_RUBY_TAG_REGEX = re.compile(r"</?ruby.*?>")

_PAYWALL_CLASS_REGEX = re.compile(r"^TagMember(Gold|Silver)$")


class ExtractError(Exception):
    """Raised when required structure is missing (HtmlParsingError analog)."""


def strip_ruby_tags(html_str: str) -> str:
    html_str = _RT_CONTENT_REGEX.sub("", html_str)
    html_str = _RP_CONTENT_REGEX.sub("", html_str)
    return _RUBY_TAG_REGEX.sub("", html_str)


def _select_one_by_class(parent: Node, cls: str, tag: str) -> Node:
    found = parent.select(tag, [cls])
    if len(found) != 1:
        raise ExtractError(f"{len(found)} {tag}.{cls} tags (expected 1)")
    return found[0]


def _text_from_descendant_by_class(parent: Node, cls: str, tag: str) -> str:
    node = _select_one_by_class(parent, cls, tag)
    text = parse_valid_child_text(node)
    if text is None:
        raise ExtractError(f"no valid text in {tag}.{cls}")
    return text


def _text_from_descendant_by_tag(parent: Node, tag: str) -> str:
    found = parent.select(tag, [])
    if len(found) != 1:
        raise ExtractError(f"{len(found)} {tag} tags (expected 1)")
    text = parse_valid_child_text(found[0])
    if text is None:
        raise ExtractError(f"no valid text in {tag}")
    return text


# --- Asahi -------------------------------------------------------------------


def extract_asahi(html_str: str) -> Optional[str]:
    root = parse_html(html_str)
    title_div = _select_one_by_class(root, "ArticleTitle", "div")
    if title_div.find_all(class_re=_PAYWALL_CLASS_REGEX):
        return None  # paywall page (P11)
    title = _text_from_descendant_by_tag(title_div, "h1").strip()

    body_div = _select_one_by_class(root, "ArticleText", "div")
    parts = [title]
    for child in body_div.element_children():
        if child.name not in ("p", "h2"):
            continue
        text = parse_valid_child_text(child)
        if text:
            parts.append(text)
    return "\n\n".join(parts)


# --- Kakuyomu ----------------------------------------------------------------


def extract_kakuyomu(html_str: str) -> Optional[str]:
    root = parse_html(html_str)
    title = _text_from_descendant_by_class(root, "widget-episodeTitle", "p")
    parts = [title.strip(), ""]  # extra newline after title
    body_div = _select_one_by_class(root, "widget-episodeBody", "div")
    paras = body_div.select("p", [])
    if not paras:
        raise ExtractError("no p tags in episode body")
    for p in paras:
        text = parse_valid_child_text(p)
        parts.append(text if text is not None else "")
    return "\n".join(parts)


# --- NHK ---------------------------------------------------------------------

_NHK_BODY_IDS = ["news_textbody", "news_textmore"]
_NHK_BODY_CLASSES = ["news_add"]


def _nhk_parse_body_div(tag: Node) -> Optional[str]:
    text = parse_valid_child_text(tag)
    if text is not None:
        return text
    sections = []
    for child in tag.element_children():
        child_text = parse_valid_child_text(child)
        if child_text:
            sections.append(child_text)
    return "\n".join(sections) if sections else None


def extract_nhk(html_str: str) -> Optional[str]:
    root = parse_html(strip_ruby_tags(html_str))
    article = _select_one_by_class(root, "detail-no-js", "section")
    title = _text_from_descendant_by_class(article, "contentTitle", "span")
    body_tags = []
    for id_ in _NHK_BODY_IDS:
        body_tags += article.find_all("div", id=id_)
    for cls in _NHK_BODY_CLASSES:
        body_tags += article.find_all("div", class_=cls)
    sections = []
    for tag in body_tags:
        text = _nhk_parse_body_div(tag)
        if text:
            sections.append(text)
    if not sections:
        raise ExtractError("no body text sections")
    return "{}\n\n{}".format(title, "\n\n".join(sections))


_EXTRACTORS = {
    "asahi": extract_asahi,
    "kakuyomu": extract_kakuyomu,
    "nhk": extract_nhk,
}


def extract_text(html_bytes, source: str) -> Optional[str]:
    """Dispatch on source; None for unparseable/paywalled pages."""
    if html_bytes is None:
        return None
    if isinstance(html_bytes, (bytes, bytearray, memoryview)):
        html_str = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        html_str = str(html_bytes)
    fn = _EXTRACTORS.get(source)
    if fn is None:
        return None
    try:
        return fn(html_str)
    except ExtractError:
        return None


@F.pandas_udf(StringType())
def extract_text_udf(html_col: pd.Series, source_col: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_text(h, s) for h, s in zip(html_col, source_col)]
    )
