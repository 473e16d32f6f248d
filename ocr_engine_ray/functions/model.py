"""Model-call plumbing analogs (SURVEY.md §2.5) — pure, deterministic.

The reference's model layer is OpenAI/Vision network calls; here the same
*control flow* is kept as pure functions so the retry/fallback/parse ladders
are real, testable code paths:

- ``extract_output_text``: flatten a Responses-API-shaped payload to text
  (app.py:233-245 / ocr_any.py:147-159) — ``output_text`` wins, else the
  concatenated ``output[].content[].text`` parts of message items.
- ``structured_call_ladder``: the 3-level structured-output fallback
  (ocr_any.py:182-213, app.py:568-604): try a schema-parsed call; if it
  yields nothing, force-JSON-parse a text call; finally try the fallback
  model; ``{}`` when everything fails.
- ``refusal_retry``: the refusal→strengthen-system→fallback-model retry
  (ocr_any.py:256-273): if the primary output looks like a refusal, return
  the fallback's output instead.
- ``mime_from_docx_ext``: the docx embedded-image ext→MIME map
  (ocr_any.py:368-381), default ``image/png``.
- ``translate_to_english`` / ``text_maybe_translate``: kept-for-compat
  no-ops, exactly like the reference (app.py:260-267).
"""

from __future__ import annotations

from collections.abc import Callable

from .textproc import first_json_object, looks_like_refusal


def extract_output_text(resp: dict) -> str:
    txt = resp.get("output_text")
    if txt:
        return txt.strip()
    parts: list[str] = []
    for item in resp.get("output") or []:
        if item.get("type") == "message":
            for part in item.get("content") or []:
                if part.get("type") in ("output_text", "text"):
                    piece = part.get("text")
                    if piece:
                        parts.append(piece)
    return "\n".join(parts).strip()


def structured_call_ladder(
    schema_call: Callable[[], dict | None],
    text_call: Callable[[], str],
    fallback_text_call: Callable[[], str],
) -> dict:
    """3-level ladder: parsed-schema call → forced-JSON text parse →
    fallback model text parse → ``{}``."""
    try:
        out = schema_call()
        if out:
            return out
    except TypeError:
        pass  # "SDK without response_format" path (ocr_any.py:199)
    out = first_json_object(text_call())
    if out:
        return out
    return first_json_object(fallback_text_call()) or {}


def refusal_retry(
    primary: Callable[[], str], fallback: Callable[[], str]
) -> tuple[str, bool]:
    """Return (text, retried): fallback output when the primary refuses."""
    out = primary()
    if looks_like_refusal(out):
        return fallback(), True
    return out, False


_DOCX_MIME = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "bmp": "image/bmp",
    "tiff": "image/tiff",
    "tif": "image/tiff",
}


def mime_from_docx_ext(ext: str) -> str:
    return _DOCX_MIME.get((ext or "").lower().lstrip("."), "image/png")


def translate_to_english(text: str) -> str:
    """Kept for compatibility, a no-op — exactly the reference's behavior
    (app.py:260-262)."""
    return text


def text_maybe_translate(text: str, translate: bool) -> str:
    """No-op: translation deferred to the interpretation stage
    (app.py:264-267)."""
    return text
