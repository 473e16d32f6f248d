"""Layout-aware line assembly — pipeline implementation.

Reconstructs reading-order lines from Vision-like (word, detected_break) token
streams.  Semantics match the reference's state machine
(``/root/reference/app.py:289-311``):

- an automatic single space is inserted before a word when the buffer doesn't
  already end with one;
- SPACE(1) / SURE_SPACE(3) breaks append a space (deduped);
- EOL_SURE(2) / LINE_BREAK(5) flush the buffer as a line, right-stripped,
  dropped when empty;
- any other break value (incl. HYPHEN(4), which the reference leaves
  unhandled) falls through to plain auto-space concatenation;
- the per-paragraph tail is flushed ``.strip()``-ed (app.py:308).

This is an independent re-implementation (string accumulator instead of the
oracle's list buffer); it shares only the break constants with the oracle.
"""

from __future__ import annotations

from .. import spec


def assemble_lines(tokens: list[tuple[str, int]]) -> list[str]:
    """One paragraph of (word, break) tokens → reading-order lines."""
    lines: list[str] = []
    cur = ""
    for word, br in tokens:
        if not word:
            continue
        if cur and not cur.endswith(" "):
            cur += " "
        cur += word
        if br in spec.SPACE_BREAKS:
            if not cur.endswith(" "):
                cur += " "
        elif br in spec.LINE_BREAKS:
            flushed = cur.rstrip()
            if flushed:
                lines.append(flushed)
            cur = ""
    tail = cur.strip()
    if tail:
        lines.append(tail)
    return lines


def page_to_text(page: list[list[tuple[str, int]]]) -> str:
    """Page (list of paragraphs) → page text: per-paragraph lines joined with
    the page line join (app.py:313-324)."""
    out: list[str] = []
    for para in page:
        out.extend(assemble_lines(para))
    return spec.PAGE_LINE_JOIN.join(out)


def docx_to_text(paragraphs: list[str], tables: list[list[list[str]]]) -> str:
    """DOCX flatten: non-empty paragraphs first, then table rows as
    ``" | "``-joined stripped cells, dropping all-empty rows; joined with
    newlines and stripped (ocr_any.py:349-359)."""
    parts = [p for p in paragraphs if p.strip()]
    for table in tables:
        for row in table:
            cells = [c.strip() for c in row]
            if any(cells):
                parts.append(spec.DOCX_TABLE_CELL_JOIN.join(cells))
    return spec.DOCX_PART_JOIN.join(parts).strip()
