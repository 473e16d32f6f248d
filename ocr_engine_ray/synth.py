"""Deterministic synthesis of the interleaved-document table and its media.

Two responsibilities:

1. ``derive_interleaved`` — a pure per-row function that turns the driver's
   ``documents`` table (``doc_id:int64, text, lang, source, n_chars``) into the
   north-rule input table ``(doc_id:string, lang, spans:list<struct<kind, text,
   media_ref, offset>>)`` (BASELINE.json ``input_hint``).  Every *count* in the
   derivation (span counts, page counts) is a pure arithmetic function of
   ``doc_id`` (``spec.h32``) so DuckDB SQL oracles can reproduce them; only the
   *content* uses a cryptographic hash.

2. The **media stand-in** (``media_pages`` / ``media_docx``) — the deterministic
   substitute for the reference's Google-Vision / PyMuPDF / python-docx media
   decoding (``/root/reference/app.py:340-412``, ``ocr_any.py:308-337,349-385``).
   A ``media_ref`` string maps to a synthetic Vision-like structure:
   pages → paragraphs → (word, detected_break) tokens — exactly the shape the
   reference's line-assembly state machine consumes (``app.py:289-311``).

Both the oracle and the Ray pipeline consume THIS module for media synthesis
(FIXTURES.md §1 "Media stand-in contract") so span equality is meaningful; the
extraction *logic* is implemented independently on each side.

Determinism: everything is a pure function of strings/ints — no RNG objects,
no wall clock — so any partitioning or re-execution yields identical bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from . import spec

# ---------------------------------------------------------------------------
# Deterministic pseudo-random stream: blake2b seed + 64-bit LCG
# ---------------------------------------------------------------------------
_LCG_A = 6364136223846793005
_LCG_C = 1442695040888963407
_M64 = 2 ** 64


def _seed(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


class _Stream:
    """Tiny deterministic value stream (LCG over a blake2b seed)."""

    __slots__ = ("x",)

    def __init__(self, key: str):
        self.x = _seed(key)

    def next(self, mod: int | None = None) -> int:
        self.x = (_LCG_A * self.x + _LCG_C) % _M64
        v = self.x >> 33
        return v % mod if mod else v


# ---------------------------------------------------------------------------
# Vocabulary (includes Devanagari, braces/JSON-ish tokens, hyphenables)
# ---------------------------------------------------------------------------
VOCAB = [
    "invoice", "total", "amount", "date", "address", "plot", "floor",
    "lease", "deed", "area", "north", "south", "east", "west", "sqft",
    "approved", "plan", "owner", "tower", "block", "flat", "annexure",
    "स्वीकृत", "क्षेत्रफल", "दिनांक", "मालिक", "भूखंड",
    "{", "}", '{"k":1}', "fence```", "7,450.00", "Rs.", "No.-42/B",
    "self-attested", "co-owner", "margin", "setback", "FAR", "survey",
]

# Weighted break choices — covers every Vision break type incl. HYPHEN(4),
# which the reference leaves unhandled (auto-space concatenation).
_BREAKS = [
    spec.BREAK_SPACE, spec.BREAK_SPACE, spec.BREAK_SPACE,
    spec.BREAK_SURE_SPACE,
    spec.BREAK_NONE, spec.BREAK_NONE,
    spec.BREAK_EOL_SURE,
    spec.BREAK_LINE_BREAK,
    spec.BREAK_HYPHEN,
]

# Field labels planted into media so the interpretation stage has work to do.
# Chosen as miniatures of the reference's INTAKE_FIELDS (ocr_any.py:78-123).
FIELD_LABELS = [
    ("Applicant", "Name"),
    ("Application", "Number"),
    ("PIN", "Code"),
    ("Loan", "Type"),
    ("Plot", "Area"),
    ("Sanction", "No"),
]


# ---------------------------------------------------------------------------
# media_ref parsing
# ---------------------------------------------------------------------------
def make_doc_id(doc_num: int) -> str:
    return f"doc-{doc_num:08d}"


def doc_num_from_id(doc_id: str) -> int:
    return int(doc_id.rsplit("-", 1)[1])


def make_media_ref(doc_id: str, media_idx: int) -> str:
    return f"media://{doc_id}/{media_idx}"


def parse_media_ref(media_ref: str) -> tuple[str, int]:
    """'media://doc-00000042/1' → ('doc-00000042', 1)."""
    rest = media_ref.split("media://", 1)[1]
    doc_id, idx = rest.rsplit("/", 1)
    return doc_id, int(idx)


# ---------------------------------------------------------------------------
# Media synthesis (the stand-in OCR "sensor")
# ---------------------------------------------------------------------------
def media_page_count(media_ref: str, kind: str) -> int:
    """Page count for a media ref — arithmetic in doc_id (SQL-reproducible).
    An unparseable pdf ref (spec: null/malformed media) has zero pages."""
    if kind == spec.KIND_IMAGE_REF:
        return 1
    try:
        doc_id, _ = parse_media_ref(media_ref)
        return spec.pdf_page_count(doc_num_from_id(doc_id))
    except (IndexError, ValueError):
        return 0


def media_page(media_ref: str, page_no: int) -> list[list[tuple[str, int]]]:
    """One synthetic Vision page: list of paragraphs of (word, break) tokens.

    ``page_no`` is 1-based.  A page may be empty (no paragraphs) — the
    extraction must still emit an empty-text span for it, mirroring the
    reference's sequential empty-page filling (app.py:453-460).
    """
    st = _Stream(f"{media_ref}#p{page_no}")
    if st.next(7) == 0:
        return []  # empty page
    paras: list[list[tuple[str, int]]] = []
    n_paras = 1 + st.next(3)
    for _ in range(n_paras):
        para: list[tuple[str, int]] = []
        n_words = 3 + st.next(10)
        for _ in range(n_words):
            word = VOCAB[st.next(len(VOCAB))]
            br = _BREAKS[st.next(len(_BREAKS))]
            para.append((word, br))
        if st.next(4) == 0:
            # Plant a "Label: value" line for the field-extraction stage.
            la, lb = FIELD_LABELS[st.next(len(FIELD_LABELS))]
            val = VOCAB[st.next(len(VOCAB))] + str(st.next(100))
            para.append((la, spec.BREAK_SPACE))
            para.append((lb + ":", spec.BREAK_SPACE))
            para.append((val, spec.BREAK_LINE_BREAK))
        paras.append(para)
    return paras


def media_pages(media_ref: str, kind: str) -> Iterator[tuple[int, list[list[tuple[str, int]]]]]:
    """Yield (page_no, page) for every page of a media ref, 1-based, in order."""
    for p in range(1, media_page_count(media_ref, kind) + 1):
        yield p, media_page(media_ref, p)


def media_docx(media_ref: str) -> tuple[list[str], list[list[list[str]]]]:
    """Synthetic DOCX: (paragraph texts, tables[rows[cells]]).

    Includes whitespace-only paragraphs (must be dropped), empty cells, and
    all-empty rows (must be dropped) — matching extract_docx_text semantics
    (ocr_any.py:349-359).
    """
    st = _Stream(f"{media_ref}#docx")
    paras: list[str] = []
    for _ in range(1 + st.next(4)):
        r = st.next(6)
        if r == 0:
            paras.append("   ")  # whitespace-only → dropped
        elif r == 1:
            la, lb = FIELD_LABELS[st.next(len(FIELD_LABELS))]
            paras.append(f"{la} {lb}: {VOCAB[st.next(len(VOCAB))]}{st.next(100)}")
        else:
            n = 4 + st.next(6)
            paras.append(" ".join(VOCAB[st.next(len(VOCAB))] for _ in range(n)))
    tables: list[list[list[str]]] = []
    for _ in range(st.next(3)):
        rows: list[list[str]] = []
        for _ in range(1 + st.next(3)):
            if st.next(5) == 0:
                rows.append(["", "  ", ""])  # all-empty row → dropped
            else:
                ncell = 2 + st.next(2)
                rows.append(
                    ["" if st.next(4) == 0 else VOCAB[st.next(len(VOCAB))] for _ in range(ncell)]
                )
        tables.append(rows)
    return paras, tables


# ---------------------------------------------------------------------------
# Interleaved-doc derivation from a `documents` row
# ---------------------------------------------------------------------------
_HTML_TEMPLATE_HEAD = (
    "<html><head><title>Synthetic {did}</title>"
    "<style>body {{ margin: 0; }} .x {{ color: red }}</style>"
    "<script>var t = \"<p>not text</p>\";</script></head><body>"
    "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> <a href=\"/c\">Contact</a></nav>"
    "<header><h1>Example Site</h1><p>tagline &amp; slogan</p></header>"
)
_HTML_TEMPLATE_TAIL = (
    "<aside><p>Related: <a href=\"/r1\">one</a> <a href=\"/r2\">two</a></p></aside>"
    "<div class=\"links\"><a href=\"/l1\">more links</a> <a href=\"/l2\">even more</a></div>"
    "<footer><p>&copy; 2024 Example Corp — <a href=\"/priv\">privacy</a></p></footer>"
    "<!-- comment <p>ghost</p> -->"
    "</body></html>"
)


def chunk_words(text: str, k: int) -> list[str]:
    """Split ``text`` into at most ``k`` non-empty word chunks.

    Boundary rule: words[i*n//k : (i+1)*n//k] with k clamped to the word count
    so no chunk is empty (keeps the SQL char-sum oracle exact:
    sum(len(chunks)) == n_chars - (k_eff - 1) for single-space-separated text).
    """
    words = text.split(" ") if text else []
    n = len(words)
    k = max(1, min(k, n)) if n else 1
    if n == 0:
        return [""]
    return [" ".join(words[i * n // k : (i + 1) * n // k]) for i in range(k)]


def html_wrap(doc_id: str, chunks: list[str]) -> str:
    """Wrap body chunks in deterministic boilerplate HTML."""
    body = "".join(f"<p>{c}</p>" for c in chunks)
    return (
        _HTML_TEMPLATE_HEAD.format(did=doc_id)
        + f'<div class="content" id="main">{body}</div>'
        + _HTML_TEMPLATE_TAIL
    )


def _offsets(doc_num: int, k: int) -> list[int]:
    """Strictly-increasing offsets with gaps (jitter < gap stride)."""
    return [4 * i + spec.h32(doc_num, 11 + i) % 3 for i in range(k)]


def _perm(doc_num: int, k: int) -> list[int]:
    """Deterministic storage permutation of span indices (input rows arrive
    shuffled; order is restored only via the offset sort)."""
    idx = list(range(k))
    r = spec.h32(doc_num, 5)
    rot = r % k if k else 0
    idx = idx[rot:] + idx[:rot]
    if (r >> 8) % 2:
        idx.reverse()
    return idx


def derive_spans(doc_num: int, text: str) -> list[dict]:
    """Pure function: documents row → list of input span dicts.

    Returns spans in *storage order* (deterministically permuted); the
    ``offset`` field encodes true order.
    """
    shape = spec.shape_of(doc_num)
    doc_id = make_doc_id(doc_num)
    spans: list[dict] = []

    def add(kind: str, txt: str, media_ref: str):
        spans.append({"kind": kind, "text": txt, "media_ref": media_ref})

    if shape == spec.SHAPE_SHORT_TEXT:
        k = spec.n_text_chunks(doc_num)
        chunks = chunk_words(text, k)
        chunks += [""] * (k - len(chunks))  # pad so span count stays SQL-exact
        for c in chunks:
            add(spec.KIND_TEXT, c, "")
    elif shape == spec.SHAPE_HTML:
        chunks = chunk_words(text, spec.n_html_paras(doc_num))
        add(spec.KIND_HTML, html_wrap(doc_id, chunks), "")
    elif shape in (spec.SHAPE_PDF, spec.SHAPE_GIANT_PDF):
        add(spec.KIND_PDF_REF, "", make_media_ref(doc_id, 0))
    elif shape == spec.SHAPE_IMAGE:
        for j in range(spec.n_image_spans(doc_num)):
            add(spec.KIND_IMAGE_REF, "", make_media_ref(doc_id, j))
    elif shape == spec.SHAPE_DOCX_MIX:
        t = spec.docx_mix_text_spans(doc_num)
        g = spec.docx_mix_image_spans(doc_num)
        chunks = chunk_words(text, t)
        chunks += [""] * (t - len(chunks))  # pad so span count stays SQL-exact
        merged: list[tuple[str, str, str]] = []
        mi = 0
        for i in range(max(t, g)):
            if i < t:
                merged.append((spec.KIND_TEXT, chunks[i], ""))  # padded to t above
            if i < g:
                merged.append((spec.KIND_IMAGE_REF, "", make_media_ref(doc_id, mi)))
                mi += 1
        for kind, txt, ref in merged:
            add(kind, txt, ref)
    else:  # SHAPE_DOCX_REF
        add(spec.KIND_DOCX_REF, "", make_media_ref(doc_id, 0))

    # docx_mix chunking may produce fewer chunks than t for tiny texts; the
    # span count must stay SQL-exact, so pad with empty text spans.
    offs = _offsets(doc_num, len(spans))
    for s, o in zip(spans, offs):
        s["offset"] = o
    return [spans[i] for i in _perm(doc_num, len(spans))]


def derive_doc(doc_num: int, text: str, lang: str) -> dict:
    """documents row → interleaved-doc row (north-rule input shape)."""
    from .functions.textproc import normalize_lang

    return {
        "doc_id": make_doc_id(doc_num),
        "lang": normalize_lang(lang),
        "spans": derive_spans(doc_num, text),
    }
