"""Real PDF text-layer extraction on the stdlib only.

The reference OCRs every PDF (rasterize via fitz → vision model,
ocr_any.py:308-337) because its inputs are scans; a data engine at corpus
scale FIRST drains the selectable text layer (most web PDFs have one) and
only sends the remainder to the expensive OCR pool.  This module is that
drain: a from-scratch parser for the subset of ISO 32000 needed to read
text — classic cross-reference PDFs with uncompressed or FlateDecode
(zlib) content streams and the standard text-showing operators.  No
external library; live in this container (unlike the fitz-gated raster
path, which stays the honest NotImplementedError seam for scanned pages).

Supported: object parsing (``N 0 obj … endobj``), /Page objects with
single or array /Contents, /Filter /FlateDecode (also as a 1-element
array), text blocks (BT…ET) with ``Tj``, ``'``, ``"`` and ``TJ`` (kerning
arrays), literal-string escapes (\\n \\r \\t \\b \\f \\( \\) \\\\ and
octal \\ddd, line continuations), hex strings ``<…> Tj``, and newlines on
the line-advance operators (Td TD T* ' ").  Out of scope (returns what it
can): object streams (/ObjStm), encryption, CID/Type0 multi-byte fonts.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_CONTENTS_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[(.*?)\]", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")


def _objects(blob: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(3) for m in _OBJ_RE.finditer(blob)}


def _stream_data(body: bytes) -> bytes | None:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    data = m.group(1)
    if _FLATE_RE.search(body):
        data = zlib.decompress(data)
    return data


_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _literal_string(buf: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(…)`` literal starting at the '(' — returns (bytes, index
    past the closing paren).  Handles nesting, escapes, octal, and
    backslash line continuations."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n and depth:
        c = buf[i : i + 1]
        if c == b"\\":
            nxt = buf[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():
                j = i + 1
                while j < min(i + 4, n) and buf[j : j + 1].isdigit():
                    j += 1
                out.append(int(buf[i + 1 : j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and buf[i : i + 1] == b"\n":
                    i += 1
            else:
                out += nxt
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


# a bare "(" starts a literal string — handed to _literal_string, which
# handles nesting/escapes the regex can't
_TOKEN_RE = re.compile(
    rb"\(|<[0-9A-Fa-f\s]*>|\[|\]|[A-Za-z'\"*]+|[-+]?[0-9.]+"
)


def _content_text(data: bytes) -> str:
    """Walk one content stream's text operators into a string (newline per
    line-advance operator)."""
    parts: list[str] = []
    pending: list[bytes] = []  # string operands awaiting their operator
    i, n = 0, len(data)
    in_text = False
    while i < n:
        m = _TOKEN_RE.search(data, i)
        if not m:
            break
        tok = m.group(0)
        if tok == b"(":
            s, end = _literal_string(data, m.start())
            pending.append(s)
            i = end
            continue
        i = m.end()
        if tok.startswith(b"<"):
            hx = re.sub(rb"\s", b"", tok[1:-1])
            if len(hx) % 2:
                hx += b"0"
            pending.append(bytes.fromhex(hx.decode("ascii")))
            continue
        if tok == b"BT":
            in_text = True
            pending = []
        elif tok == b"ET":
            in_text = False
            parts.append("\n")
        elif in_text and tok in (b"Tj", b"TJ"):
            for s in pending:
                parts.append(s.decode("latin-1"))
            pending = []
        elif in_text and tok in (b"'", b'"'):
            parts.append("\n")
            for s in pending[-1:]:  # ' and " show ONE string operand
                parts.append(s.decode("latin-1"))
            pending = []
        elif in_text and tok in (b"Td", b"TD", b"T*"):
            parts.append("\n")
            pending = []
        elif tok in (b"[", b"]"):
            continue  # TJ array brackets; numbers (kerning) skip naturally
    text = "".join(parts)
    # collapse runs of blank lines introduced by positioning operators
    lines = [ln.strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def pdf_extract_text(blob: bytes) -> list[str]:
    """Per-page text of a PDF's selectable layer, in /Page object order.
    Pages whose content can't be understood yield ''."""
    objs = _objects(blob)
    pages: list[str] = []
    for num in sorted(objs):
        body = objs[num]
        if not _PAGE_RE.search(body):
            continue
        content_ids: list[int] = []
        ma = _CONTENTS_ARR_RE.search(body)
        if ma:
            content_ids = [int(r.group(1)) for r in _REF_RE.finditer(ma.group(1))]
        else:
            ms = _CONTENTS_REF_RE.search(body)
            if ms:
                content_ids = [int(ms.group(1))]
        texts = []
        for cid in content_ids:
            if cid in objs:
                try:
                    data = _stream_data(objs[cid])
                except zlib.error:
                    data = None
                if data:
                    texts.append(_content_text(data))
        pages.append("\n".join(t for t in texts if t))
    return pages


def pdf_has_text_layer(blob: bytes) -> bool:
    """True when any page yields non-empty selectable text — the routing
    predicate between the drain path (this module) and the OCR pool (the
    fitz-gated raster seam)."""
    try:
        return any(p.strip() for p in pdf_extract_text(blob))
    except Exception:
        return False
