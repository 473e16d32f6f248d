"""Field extraction & merging — pipeline implementation.

- ``parse_unit_fields``: deterministic stand-in for the reference's per-unit
  LLM structured extraction (ocr_any.py:275-305): ``Label: value`` lines →
  ``{slug_key: value}`` (later lines overwrite within one unit).
- ``fold_fields``: the order-sensitive ``merge_keep_longer`` fold across units
  (ocr_any.py:229-235): falsy values skipped; a later unit replaces a key only
  when its ``str()`` is strictly longer — ties keep the EARLIER unit.
- ``normalize_rich_fields``: service-mode ``{value, conf, source}``
  normalization (app.py:615-628): non-dict → wrapped with conf 0.5; conf
  clamped; a missing/malformed ``source`` is repaired by substring-searching
  the value across the document's own page texts (first page containing it
  wins, default page 1).
"""

from __future__ import annotations

import re

from .textproc import clamp_conf, label_to_key

FIELD_LINE_RE = re.compile(r"^\s*([A-Za-z][A-Za-z ]{0,58}):\s*(\S.*)$")


def parse_unit_fields(text: str) -> dict[str, str]:
    out: dict[str, str] = {}
    if ":" not in text:
        return out
    for line in text.split("\n"):
        m = FIELD_LINE_RE.match(line)
        if m:
            out[label_to_key(m.group(1))] = m.group(2).strip()
    return out


def fold_unit_text(merged: dict[str, str], text: str) -> None:
    """In-place merge_keep_longer fold of ONE unit text's parsed fields into
    ``merged`` — the single definition of the per-unit fold used by all
    three extraction surfaces (reassemble, doc_extract, interpret), so the
    tie semantics (first-seen wins on equal length, falsy values skipped)
    cannot drift between paths."""
    if ":" not in (text or ""):
        return
    for k, v in parse_unit_fields(text).items():
        if v and (k not in merged or len(str(v)) > len(str(merged[k]))):
            merged[k] = v


def fold_fields(unit_dicts: list[dict[str, str]]) -> dict[str, str]:
    merged: dict[str, str] = {}
    for d in unit_dicts:
        for k, v in (d or {}).items():
            if not v:
                continue
            prev = merged.get(k)
            if prev is None or len(str(v)) > len(str(prev)):
                merged[k] = v
    return merged


def normalize_rich_fields(
    out: dict, filename: str, pages: list[tuple[int, str]]
) -> dict:
    """Normalize an extraction record in place and return it (app.py:615-628)."""
    for k, obj in list(out.items()):
        if not isinstance(obj, dict):
            out[k] = {"value": str(obj), "conf": 0.5, "source": f"{filename}#page 1"}
            obj = out[k]
        obj["conf"] = clamp_conf(obj.get("conf", 0.5))
        src = obj.get("source")
        if not isinstance(src, str) or "#page" not in src:
            guess = 1
            # model JSON routinely carries numeric values — coerce before
            # strip/substring search (str values pass through unchanged)
            v = obj.get("value")
            val = ("" if v is None else str(v)).strip()
            if val:
                for pno, txt in pages:
                    if val in (txt or ""):
                        guess = pno
                        break
            obj["source"] = f"{filename}#page {guess}"
    return out
