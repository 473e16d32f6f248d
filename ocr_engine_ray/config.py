"""Pipeline configuration — the §2.7 user-extension surface.

The reference configures its engine through environment switches read at
import time (``ocr_any.py:21-28``): ``OCR_LANG`` (en/hi), ``OCR_REDACT``,
``OCR_TRANSLATE_ALWAYS``, ``OCR_STRUCTURED``; the service additionally takes
a per-request field vocabulary (``app.py:703-716`` parses user labels,
``app.py:193-212`` builds the schema from them) and the CLI ships a fixed
45-entry ``INTAKE_FIELDS`` vocabulary (``ocr_any.py:78-123``).

Here the same surface is one immutable ``PipelineConfig`` value passed to
the pipeline entry points (batch engines configure per job, not per process):

- ``lang`` / ``translate_always`` select the translation behavior exactly
  like the reference's prompt dispatch (``ocr_any.py:434-438``): translate
  when ``translate_always`` or ``lang == "hi"``.  The translation stand-in
  is the identity on text (the reference's translate step is a semantic
  no-op at our determinism level — see functions/model.py C5) but marks the
  span, so the *count* surface is exact and SQL-checkable.
- ``redact`` applies the redaction guide analog (``ocr_any.py:44-48``) to
  every extracted unit before field folding — mask any token carrying ≥ 4
  digits, keeping the last 4 characters (length-preserving, like the
  reference's ``XXXXXXXXXXXX1234`` example).
- ``structured`` selects structured (rich-fields JSON) vs free-text output,
  mirroring the CLI's ``OCR_STRUCTURED`` main() dispatch
  (``ocr_any.py:438-470``).
- ``field_labels`` is the per-request vocabulary: labels → keys via
  ``label_to_key`` (M2), and field folding keeps ONLY those keys ("extract
  exactly these fields").  ``None`` means open vocabulary (discover all
  ``Label: value`` lines), the round-1 behavior.
- ``extractors`` extends/overrides the kind → extractor registry
  (stages/registry.py).  Custom kinds route through the row-local path.

Plus the Ray-side tuning knobs that were loose kwargs in round 1.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace
from typing import Callable

from .functions.textproc import label_to_key

# Miniature of the reference CLI's fixed INTAKE_FIELDS vocabulary
# (ocr_any.py:78-123) matching the labels the synthetic corpus plants
# (synth.FIELD_LABELS); a real deployment passes its own 45-entry list.
DEFAULT_FIELD_LABELS: tuple[str, ...] = (
    "Applicant Name",
    "Application Number",
    "PIN Code",
    "Loan Type",
    "Plot Area",
    "Sanction No",
)


@dataclass(frozen=True)
class PipelineConfig:
    # Mode switches (ocr_any.py:21-28)
    lang: str = "en"
    redact: bool = False
    translate_always: bool = False
    structured: bool = True
    # Field vocabulary (None = open discovery)
    field_labels: tuple[str, ...] | None = None
    # Extractor registry extensions: kind -> extractor callable
    # (see stages/registry.py for the signature)
    extractors: dict[str, Callable] | None = None
    # Ray tuning
    num_buckets: int = 64
    extract_batch_size: int = 256
    giant_unit_threshold: int | None = None
    compute: str = "tasks"

    def __post_init__(self):
        if self.lang not in ("en", "hi"):
            object.__setattr__(self, "lang", "en")

    @property
    def translate_active(self) -> bool:
        """The reference's prompt dispatch (ocr_any.py:434-438): translate
        everything when forced, or when the configured source lang is hi."""
        return self.translate_always or self.lang == "hi"

    def vocabulary(self) -> dict[str, str] | None:
        """field_labels → {key: label} via label_to_key (app.py:194)."""
        if self.field_labels is None:
            return None
        return {label_to_key(lbl): lbl for lbl in self.field_labels}

    def fingerprint(self) -> str:
        """Stable per-worker cache key for task-mode extractor state.  The
        extractor registry is keyed by its pickled bytes, not just its kind
        names — two configs carrying different functions under the same kind
        must not share a worker-cached extractor."""
        if self.extractors:
            import hashlib

            import ray.cloudpickle as cp

            ex = hashlib.md5(
                cp.dumps(sorted(self.extractors.items()))
            ).hexdigest()
        else:
            ex = ""
        return repr(
            (self.lang, self.redact, self.translate_always, self.structured,
             self.field_labels, ex)
        )

    def extraction_kwargs(self) -> dict:
        return {
            "num_buckets": self.num_buckets,
            "extract_batch_size": self.extract_batch_size,
            "giant_unit_threshold": self.giant_unit_threshold,
            "compute": self.compute,
        }

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "PipelineConfig":
        """CLI parity: build a config from the reference's env switches."""
        e = os.environ if env is None else env
        truthy = lambda k, d: e.get(k, d).strip().lower() == "true"
        return cls(
            lang=e.get("OCR_LANG", "en").strip().lower(),
            redact=truthy("OCR_REDACT", "false"),
            translate_always=truthy("OCR_TRANSLATE_ALWAYS", "false"),
            structured=truthy("OCR_STRUCTURED", "true"),
        )

    def with_(self, **kw) -> "PipelineConfig":
        return replace(self, **kw)
