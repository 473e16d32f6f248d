"""Single-process reference extractor — the correctness contract.

This is a literal, sequential transcription of the reference engine's
per-document semantics (``/root/reference/app.py``, ``ocr_any.py``), applied to
the interleaved-span data model.  The distributed Ray Data pipeline
(``ocr_engine_ray.pipelines.extraction``) must reproduce this row-for-row:
span-sequence equality on ``(kind, text, media_ref, order)`` plus the
``fields_json`` fold (the north rule / BASELINE.json invariant).

IMPORTANT: the logic here is deliberately implemented *independently* of the
pipeline's vectorized implementations (``ocr_engine_ray.functions``); the two
share only ``spec`` constants and the ``synth`` media stand-in (SURVEY.md §7.4).

Semantics transcribed (reference file:line):
- line-assembly state machine ........ app.py:289-311 (proto variant, incl.
  per-paragraph tail flush with .strip(); SPACE/SURE_SPACE append space;
  EOL_SURE/LINE_BREAK flush rstrip'd line; HYPHEN falls through = auto-space)
- per-page line join "\n" ............ app.py:323
- empty-page filling 1..page_count ... app.py:453-460
- docx flatten (paras then tables,
  " | " cell join, drop empty) ....... ocr_any.py:349-359
- merge_keep_longer fold ............. ocr_any.py:229-235 (skip falsy; replace
  only on strictly longer str(); ties keep the EARLIER unit's value)
- label_to_key slugify ............... app.py:187-191
"""

from __future__ import annotations

import html as _htmllib
import json
import re

from . import spec, synth

# ---------------------------------------------------------------------------
# Line assembly (literal transcription of app.py:289-311)
# ---------------------------------------------------------------------------


def _paragraph_lines(paragraph: list[tuple[str, int]]) -> list[str]:
    lines: list[str] = []
    buf: list[str] = []
    for wtxt, br in paragraph:
        if not wtxt:
            continue
        if buf and not buf[-1].endswith(" "):
            buf.append(" ")
        buf.append(wtxt)
        if br in (spec.BREAK_SPACE, spec.BREAK_SURE_SPACE):
            if not buf[-1].endswith(" "):
                buf.append(" ")
        elif br in (spec.BREAK_EOL_SURE, spec.BREAK_LINE_BREAK):
            line = "".join(buf).rstrip()
            if line:
                lines.append(line)
            buf = []
    tail = "".join(buf).strip()
    if tail:
        lines.append(tail)
    return lines


def page_text(page: list[list[tuple[str, int]]]) -> str:
    all_lines: list[str] = []
    for para in page:
        all_lines.extend(_paragraph_lines(para))
    return spec.PAGE_LINE_JOIN.join(all_lines)


# ---------------------------------------------------------------------------
# DOCX flatten (literal transcription of ocr_any.py:349-359)
# ---------------------------------------------------------------------------


def docx_flatten(paragraphs: list[str], tables: list[list[list[str]]]) -> str:
    parts: list[str] = []
    for p in paragraphs:
        if p.strip():
            parts.append(p)
    for tbl in tables:
        for row in tbl:
            row_text = [cell.strip() for cell in row]
            if any(row_text):
                parts.append(spec.DOCX_TABLE_CELL_JOIN.join(row_text))
    return spec.DOCX_PART_JOIN.join(parts).strip()


# ---------------------------------------------------------------------------
# HTML main-content extraction (oracle implementation of the spec in
# functions/html.py — sequential, regex-per-step; north-rule extension)
# ---------------------------------------------------------------------------

_RM_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
# The opening tag MUST be terminated with [^>]*> — same as the pipeline's
# _CONTAINER_RE; a laxer `.*?` diverges on malformed markup (an unterminated
# '<nav foo </nav>' would swallow following content on one side only).
_RM_CONTAINERS = re.compile(
    r"<(script|style|head|nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.DOTALL | re.IGNORECASE,
)
_BLOCK_TAG = re.compile(
    r"</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|hr|section|article|main|blockquote)\b[^>]*>",
    re.IGNORECASE,
)
_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.DOTALL | re.IGNORECASE)
_ANY_TAG = re.compile(r"<[^>]+>")
_WS_RUN = re.compile(r"\s+")


def _clean_text(fragment: str) -> str:
    txt = _ANY_TAG.sub("", fragment)
    txt = _htmllib.unescape(txt)
    return _WS_RUN.sub(" ", txt).strip()


def html_extract(raw: str) -> str:
    s = _RM_COMMENT.sub("", raw)
    prev = None
    while prev != s:  # handle (non-pathological) nesting of removed containers
        prev = s
        s = _RM_CONTAINERS.sub("", s)
    s = _BLOCK_TAG.sub("\x00", s)  # sentinel: literal newlines stay in-block
    out: list[str] = []
    for block in s.split("\x00"):
        visible = _clean_text(block)
        if not visible:
            continue
        anchor_len = sum(len(_clean_text(m)) for m in _ANCHOR.findall(block))
        if 2 * anchor_len > len(visible):
            continue  # link-dense boilerplate block
        out.append(visible)
    return "\n".join(out)


# ---------------------------------------------------------------------------
# Field interpretation stand-in (per-unit "Label: value" lines → dict),
# folded across units in order with merge_keep_longer.
# ---------------------------------------------------------------------------

NON_ALNUM = re.compile(r"[^a-z0-9]+")
FIELD_LINE = re.compile(r"^\s*([A-Za-z][A-Za-z ]{0,58}):\s*(\S.*)$")


def label_to_key(label: str) -> str:
    s = (label or "").strip().lower()
    s = NON_ALNUM.sub("_", s)
    s = re.sub(r"_+", "_", s).strip("_")
    return (s or "field")[:80]


def unit_fields(text: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in text.split("\n"):
        m = FIELD_LINE.match(line)
        if m:
            out[label_to_key(m.group(1))] = m.group(2).strip()
    return out


def merge_keep_longer(dst: dict, src: dict) -> dict:
    for k, v in (src or {}).items():
        if not v:
            continue
        if k not in dst or len(str(v)) > len(str(dst.get(k, ""))):
            dst[k] = v
    return dst


# ---------------------------------------------------------------------------
# Per-document extraction (the oracle proper)
# ---------------------------------------------------------------------------


def rich_fields_document(doc: dict) -> str:
    """Service-mode rich fields for one doc (app.py:606-630 transcription):
    fold per-unit fields, wrap every value as {value, conf, source} with
    conf 0.5 and substring-search page provenance (first page containing the
    value wins, default 1)."""
    extracted = extract_document(doc)
    doc_id = doc["doc_id"]
    pages = [(s["order"] + 1, s["text"]) for s in extracted["spans"]]
    # extract_document already computed the identical merge_keep_longer
    # fold — reuse it (the pipeline twin does the same via fields_json).
    raw: dict[str, str] = json.loads(extracted["fields_json"] or "{}")
    out: dict[str, dict] = {}
    for k, v in raw.items():
        guess = 1
        val = (v or "").strip()
        if val:
            for pno, txt in pages:
                if val in (txt or ""):
                    guess = pno
                    break
        out[k] = {"value": str(v), "conf": 0.5, "source": f"{doc_id}#page {guess}"}
    return json.dumps(out, sort_keys=True, ensure_ascii=False)


def free_text_document(doc: dict) -> str:
    """CLI free-text mode for one doc (ocr_any.py:308-321 transcription):
    '[Page i]\\n{text}' blocks, each rstripped, joined by blank lines,
    stripped."""
    extracted = extract_document(doc)
    texts: list[str] = []
    for i, s in enumerate(extracted["spans"], start=1):
        texts.append(f"[Page {i}]\n{s['text']}".rstrip())
    return "\n\n".join(texts).strip()


def vocab_fields_document(doc: dict, vocab: dict[str, str]) -> str:
    """Fixed-vocabulary structured fields for one doc: the folded fields
    filtered to the requested keys (app.py:703-716 fields_to_extract /
    ocr_any.py:78-123 INTAKE_FIELDS semantics) — the oracle twin of
    ``pipelines.modes.vocab_fields``'s per-doc fields_json."""
    fields = json.loads(extract_document(doc)["fields_json"] or "{}")
    kept = {k: v for k, v in fields.items() if k in vocab}
    return json.dumps(kept, sort_keys=True, ensure_ascii=False)


def extract_document(doc: dict) -> dict:
    """Interleaved doc row → extracted row.

    Input:  {"doc_id": str, "spans": [{kind, text, media_ref, offset}, ...]}
    Output: {"doc_id", "spans": [{kind, text, media_ref, order}], "fields_json"}
    """
    doc_id = doc["doc_id"]
    # Null tolerance (spec): null offset → 0, null kind/text/media_ref → "".
    cleaned = [
        {
            "kind": s.get("kind") or "",
            "text": s.get("text") or "",
            "media_ref": s.get("media_ref") or "",
            "offset": s.get("offset") or 0,
        }
        for s in (doc.get("spans") or [])
    ]
    spans_in = sorted(enumerate(cleaned), key=lambda t: (t[1]["offset"], t[0]))
    out_spans: list[dict] = []

    def emit(kind: str, text: str, media_ref: str):
        out_spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "order": len(out_spans)}
        )

    for _, s in spans_in:
        kind = s["kind"]
        if kind == spec.KIND_TEXT:
            emit(spec.OUT_TEXT, s["text"] or "", "")
        elif kind == spec.KIND_HTML:
            emit(spec.OUT_HTML_TEXT, html_extract(s["text"] or ""), "")
        elif kind == spec.KIND_PDF_REF:
            ref = s["media_ref"]
            # Sequential page labels with empty-page filling (app.py:453-460).
            for _pno, page in synth.media_pages(ref, spec.KIND_PDF_REF):
                emit(spec.OUT_PDF_PAGE, page_text(page), ref)
        elif kind == spec.KIND_IMAGE_REF:
            ref = s["media_ref"]
            page = synth.media_page(ref, 1)
            emit(spec.OUT_IMAGE_TEXT, page_text(page), ref)
        elif kind == spec.KIND_DOCX_REF:
            ref = s["media_ref"]
            paras, tables = synth.media_docx(ref)
            emit(spec.OUT_DOCX_TEXT, docx_flatten(paras, tables), ref)
        else:  # unknown kind: pass through as text (default-to-image analog)
            emit(spec.OUT_TEXT, s["text"] or "", s["media_ref"] or "")

    merged: dict[str, str] = {}
    for s in out_spans:
        merged = merge_keep_longer(merged, unit_fields(s["text"]))

    return {
        "doc_id": doc_id,
        "spans": out_spans,
        "fields_json": json.dumps(merged, sort_keys=True, ensure_ascii=False),
    }
