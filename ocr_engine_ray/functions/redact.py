"""Redaction stand-in (M-mode, OCR_REDACT analog).

The reference's redaction is a *system-prompt guide* (ocr_any.py:44-48): the
model masks "government IDs or highly sensitive numbers" keeping the last 4
characters (``XXXXXXXXXXXX1234``), PAN-style ids as ``XXXXX9999X``.  The
deterministic stand-in applies the same contract as a pure function over
extracted unit text:

- any whitespace-delimited token containing ≥ 4 digits is treated as a
  sensitive number and masked to ``X`` everywhere except its last 4
  characters (length-preserving, like the reference's example); tokens of
  ≤ 4 characters are masked ENTIRELY — "keep the last 4" would leave a
  bare 4-digit number fully visible, defeating the redaction;
- PAN-pattern tokens (``AAAAA9999A``) are masked as ``XXXXX<digits>X``
  exactly as the guide specifies.

Length preservation is load-bearing for the driver oracle: redaction must
not change any char-count invariant, and clean text (the inline synthetic
corpus has no digits) must pass through byte-identical — both asserted by
the ``mode_redact_inline`` SQL oracle.
"""

from __future__ import annotations

import re

_PAN_RE = re.compile(r"^[A-Z]{5}[0-9]{4}[A-Z]$")
_DIGIT_RE = re.compile(r"[0-9]")
_TOKEN_RE = re.compile(r"\S+")


def _mask_token(tok: str) -> str | None:
    """Masked form of a token, or None if it is not sensitive."""
    if _PAN_RE.match(tok):
        return "XXXXX" + tok[5:9] + "X"
    if len(_DIGIT_RE.findall(tok)) >= 4:
        if len(tok) <= 4:
            return "X" * len(tok)
        return "X" * (len(tok) - 4) + tok[-4:]
    return None


def mask_sensitive(text: str) -> tuple[str, int]:
    """Apply the redaction guide to one unit's text.

    Returns (masked_text, n_masked_tokens); masked_text has identical length
    and identical whitespace structure to the input.
    """
    n = 0
    out_parts: list[str] = []
    last = 0
    for m in _TOKEN_RE.finditer(text):
        masked = _mask_token(m.group(0))
        if masked is not None:
            out_parts.append(text[last : m.start()])
            out_parts.append(masked)
            last = m.end()
            n += 1
    if n == 0:
        return text, 0
    out_parts.append(text[last:])
    return "".join(out_parts), n
