"""Scalar text-processing operators from the reference's helper layer.

Each function re-expresses one operator from SURVEY.md §2.2 (reference
file:line in each docstring).  These are pure and cheap; they run inside
``map_batches`` UDFs (scalar per value) or feed vectorized wrappers.
"""

from __future__ import annotations

import json
import mimetypes
import re
from pathlib import PurePosixPath

from .. import spec

NON_ALNUM_RE = re.compile(r"[^a-z0-9]+")
UNDERSCORE_RUN_RE = re.compile(r"_+")
DEVANAGARI_RE = re.compile(r"[ऀ-ॿ]")  # app.py:184, ocr_any.py:126
REFUSAL_RE = re.compile(r"\b(i'?m|i am|sorry|cannot|can'?t|unable|assist)\b", re.I)  # ocr_any.py:161
JSON_OBJ_RE = re.compile(r"\{.*\}", re.DOTALL)  # app.py:185

_DOCX_MIME = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"


def label_to_key(label: str) -> str:
    """Slugify a field label → snake_case key (app.py:187-191): lowercase,
    non-alnum runs → ``_``, collapse, strip, fallback ``"field"``, ≤80 chars."""
    s = (label or "").strip().lower()
    s = NON_ALNUM_RE.sub("_", s)
    s = UNDERSCORE_RUN_RE.sub("_", s).strip("_")
    return (s or "field")[:80]


def first_json_object(text: str) -> dict:
    """First ``{...}`` blob in ``text`` parsed as JSON, else ``{}``
    (app.py:214-224 / ocr_any.py:166-176)."""
    if not text:
        return {}
    m = JSON_OBJ_RE.search(text)
    if not m:
        return {}
    try:
        out = json.loads(m.group(0))
    except Exception:
        return {}
    return out if isinstance(out, dict) else {}


def clamp_conf(x) -> float:
    """Coerce to float, default 0.5, clamp to [0, 1] (app.py:226-231)."""
    try:
        v = float(x)
    except (TypeError, ValueError):
        return 0.5
    if v != v:  # NaN fails both comparisons below and would escape the clamp
        return 0.5
    return 0.0 if v < 0 else 1.0 if v > 1 else v


def detect_type(filename: str, head: bytes = b"") -> str:
    """File-type classifier (app.py:635-645): extension ``.pdf`` or magic
    ``%PDF-`` → pdf; ``.docx``/OOXML MIME → docx; ``image/*`` MIME → image;
    default image."""
    ext = PurePosixPath(filename).suffix.lower()
    if ext == ".pdf" or head[:5] == b"%PDF-":
        return "pdf"
    if ext == ".docx" or mimetypes.guess_type(filename)[0] == _DOCX_MIME:
        return "docx"
    return "image"  # image/* MIME and the reference's default both land here


def normalize_lang(lang: str) -> str:
    """Language normalization: lowercase/strip; anything outside {en, hi}
    defaults to ``en`` (ocr_any.py:21-23; service variant app.py:689-699
    rejects instead — batch pipelines degrade rather than 400)."""
    s = (lang or "").strip().lower()
    return s if s in spec.VALID_LANGS else spec.DEFAULT_LANG


def split_langs(raw: str, n_files: int) -> list[str]:
    """Service-mode lang list handling (app.py:689-695): split a single field
    on commas/whitespace, lowercase, pad with ``en`` to ``n_files``, truncate."""
    langs = [s.strip().lower() for s in re.split(r"[,\s]+", raw or "") if s.strip()]
    if len(langs) < n_files:
        langs += [spec.DEFAULT_LANG] * (n_files - len(langs))
    return langs[:n_files]


def split_field_labels(items: list[str]) -> list[str]:
    """Field-label parsing (app.py:703-716): split each item on ``[,\\n;]+``,
    strip, drop empties, preserve order."""
    labels: list[str] = []
    for item in items:
        labels.extend(s.strip() for s in re.split(r"[,\n;]+", item or "") if s.strip())
    return labels


def has_devanagari(text: str) -> bool:
    return bool(DEVANAGARI_RE.search(text or ""))


def looks_like_refusal(text: str) -> bool:
    return bool(REFUSAL_RE.search(text or ""))
