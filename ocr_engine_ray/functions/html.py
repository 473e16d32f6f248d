"""HTML boilerplate stripping + DOM-heuristic main-content extraction.

North-rule extension (the reference has no HTML path; BASELINE.json's
``north_star`` adds "batched boilerplate stripping and DOM-heuristic text
extraction for HTML spans").  The SPEC — shared with the oracle implementation
in ``ocr_engine_ray.oracle`` (which re-implements it independently):

1. remove ``<!-- … -->`` comments;
2. remove, with their content: ``script``, ``style``, ``head``, ``nav``,
   ``header``, ``footer``, ``aside`` (case-insensitive; repeated until fixed
   point to handle nesting);
3. replace block-level tags (p, div, h1-h6, li, ul, ol, table, tr, td, th,
   br, hr, section, article, main, blockquote — open or close) with a block
   separator (a private sentinel, NOT "\n", so literal newlines inside a
   block stay inside it and are collapsed in step 4);
4. split on the separator into candidate blocks; per block compute the *visible
   text* (strip remaining tags, ``html.unescape`` entities, collapse
   whitespace runs to a single space, strip) and the *anchor text length*
   (visible text inside ``<a>…</a>``);
5. drop empty blocks and link-dense blocks (anchor_len * 2 > visible_len —
   the classic link-density boilerplate heuristic);
6. join surviving blocks with ``"\n"``.

Used per-row inside ``map_batches`` batches; all patterns are compiled once at
import so the per-batch cost is pure matching.
"""

from __future__ import annotations

import html as _htmllib
import re

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_CONTAINER_RE = re.compile(
    r"<(?P<t>script|style|head|nav|header|footer|aside)\b[^>]*>.*?</(?P=t)\s*>",
    re.S | re.I,
)
_BLOCK_RE = re.compile(
    r"</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|hr|section|article|main|blockquote)\b[^>]*>",
    re.I,
)
_A_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def _visible(fragment: str) -> str:
    return _WS_RE.sub(" ", _htmllib.unescape(_TAG_RE.sub("", fragment))).strip()


def extract_main_text(raw: str) -> str:
    """Extract main content text from an HTML string per the module SPEC."""
    if not raw:
        return ""
    s = _COMMENT_RE.sub("", raw)
    while True:
        s2 = _CONTAINER_RE.sub("", s)
        if s2 == s:
            break
        s = s2
    keep: list[str] = []
    for block in _BLOCK_RE.sub("\x00", s).split("\x00"):
        vis = _visible(block)
        if not vis:
            continue
        a_len = 0
        for frag in _A_RE.findall(block):
            a_len += len(_visible(frag))
        if a_len * 2 > len(vis):
            continue
        keep.append(vis)
    return "\n".join(keep)
