"""The extraction stage: an actor-pool ``map_batches`` over exploded spans.

``SpanExtractor`` is the Ray-Data analog of the reference's per-process model
clients (OpenAI/Vision held as module globals, app.py:86,128-129): the
"OCR model" — here the deterministic media stand-in + line assembler — is
constructed ONCE per actor in ``__init__`` and applied per Arrow batch in
``__call__``.  Use it as::

    ds.map_batches(SpanExtractor, batch_format="pyarrow",
                   batch_size=..., concurrency=(lo, hi), num_cpus=1)

Routing happens inside the batch on the ``kind`` column:

- ``text``   → zero-copy pass-through (vectorized mask selection);
- ``html``   → per-row main-content extraction (compiled patterns);
- ``pdf_ref``  (page shard rows) → per-page stand-in OCR + line assembly,
  one output row per page incl. empty pages (app.py:453-460);
- ``image_ref`` → single page OCR;
- ``docx_ref``  → docx flatten (paragraphs, then " | " table rows).

A retry ladder mirrors the reference's refusal→fallback-model ladder
(ocr_any.py:269-272, app.py:586-604): a deterministic simulated transient
fault (~1/997 of media units) fails the primary attempt and succeeds on the
fallback; retries are counted into the ``retries`` output column so partition
checkpoints can persist an ``ocr_failures``-style metric without hidden state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import spec, synth
from ..functions import html as fhtml
from ..functions import lines as flines

OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("span_idx", pa.int32()),
        ("sub", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("retries", pa.int32()),
    ]
)


class TransientOCRError(RuntimeError):
    """Simulated transient model fault (primary attempt only)."""


_TASK_SPAN_EXTRACTORS: dict = {}


def span_extract_task(batch: pa.Table) -> pa.Table:
    """Task-mode wrapper around :class:`SpanExtractor` — state cached once
    per worker process (see doc_extract.doc_extract_task for the rationale)."""
    if None not in _TASK_SPAN_EXTRACTORS:
        _TASK_SPAN_EXTRACTORS[None] = SpanExtractor()
    return _TASK_SPAN_EXTRACTORS[None](batch)


def make_span_extract_task(config):
    """Task-mode wrapper bound to a :class:`PipelineConfig` (custom extractor
    registry) — the giant-path twin of doc_extract.make_doc_extract_task, so
    a custom-kind span inside a giant document extracts identically on both
    routing paths."""
    key = config.fingerprint()
    extractors = config.extractors

    def task(batch: pa.Table) -> pa.Table:
        if key not in _TASK_SPAN_EXTRACTORS:
            _TASK_SPAN_EXTRACTORS[key] = SpanExtractor(extractors=extractors)
        return _TASK_SPAN_EXTRACTORS[key](batch)

    return task


class SpanExtractor:
    """Stateful extraction worker (one per actor in the pool).

    ``extractors`` (kind → registry fn, see stages/registry.py) overrides
    or extends the built-in per-kind routing — the same §2.7 extension
    surface DocExtractor exposes, so custom kinds behave identically when a
    giant document routes through the distributed explode path.  Overridden
    kinds dispatch through the registry fn; un-overridden kinds keep the
    hardcoded fast paths (semantically the default registry)."""

    FAIL_MOD = 997  # ~0.1% of media units fail the primary attempt

    def __init__(self, extractors: dict | None = None) -> None:
        # "Model load": bind the stand-in OCR + compiled extractors once.
        self._page_text = flines.page_to_text
        self._docx_text = flines.docx_to_text
        self._html_text = fhtml.extract_main_text
        self._custom = dict(extractors or {})
        self.total_retries = 0

    # -- worker context exposed to registry extractors (ctx contract) -----
    def ocr_unit(self, ref: str, page_no: int) -> tuple[str, int]:
        return self._ocr_unit(ref, page_no)

    def html_text(self, html: str) -> str:
        return self._html_text(html)

    def docx_text(self, paras, tables) -> str:
        return self._docx_text(paras, tables)

    # -- the retry ladder (C4 analog) ------------------------------------
    def _ocr_unit(self, ref: str, page_no: int) -> tuple[str, int]:
        retries = 0
        for attempt in (0, 1):
            try:
                if attempt == 0 and synth._seed(f"{ref}#p{page_no}#fault") % self.FAIL_MOD == 0:
                    raise TransientOCRError(ref)
                return self._page_text(synth.media_page(ref, page_no)), retries
            except TransientOCRError:
                retries += 1  # fall back to the "fallback model" (same stand-in)
        return self._page_text(synth.media_page(ref, page_no)), retries

    def __call__(self, batch: pa.Table) -> pa.Table:
        kind = batch.column("kind")
        # The vectorized text fast-path only applies while 'text' keeps its
        # default semantics; an override routes text through the registry.
        if spec.KIND_TEXT in self._custom:
            is_text = pc.equal(kind, "\x00never")
        else:
            is_text = pc.equal(kind, spec.KIND_TEXT)

        parts: list[pa.Table] = []

        # text spans: vectorized pass-through
        if pc.any(is_text).as_py():
            t = batch.filter(is_text)
            n = t.num_rows
            parts.append(
                pa.table(
                    {
                        "doc_id": t.column("doc_id"),
                        "offset": t.column("offset"),
                        "span_idx": t.column("span_idx"),
                        "sub": pa.array(np.zeros(n, dtype=np.int32)),
                        "kind": pa.array([spec.OUT_TEXT] * n, pa.string()),
                        # null text coerces to "" (oracle: `s["text"] or ""`)
                        "text": pc.fill_null(t.column("text"), ""),
                        "media_ref": pa.array([""] * n, pa.string()),
                        "retries": pa.array(np.zeros(n, dtype=np.int32)),
                    },
                    schema=OUT_SCHEMA,
                )
            )

        rest = batch.filter(pc.invert(is_text))
        if rest.num_rows:
            out = {k: [] for k in OUT_SCHEMA.names}

            def emit(d, off, sidx, sub, okind, text, ref, retr):
                out["doc_id"].append(d)
                out["offset"].append(off)
                out["span_idx"].append(sidx)
                out["sub"].append(sub)
                out["kind"].append(okind)
                out["text"].append(text)
                out["media_ref"].append(ref)
                out["retries"].append(retr)

            for d, off, sidx, k, txt, ref, lo, hi in zip(
                rest.column("doc_id").to_pylist(),
                rest.column("offset").to_pylist(),
                rest.column("span_idx").to_pylist(),
                rest.column("kind").to_pylist(),
                rest.column("text").to_pylist(),
                rest.column("media_ref").to_pylist(),
                rest.column("page_lo").to_pylist(),
                rest.column("page_hi").to_pylist(),
            ):
                if k in self._custom:
                    # Exactly-once dispatch: if the user overrode the
                    # (sharded) pdf kind, explode still emits page shards —
                    # run the fn on the first shard only, with the full ref.
                    # Overriding a sharded built-in therefore trades its
                    # page-level fan-out for registry semantics.
                    if lo is not None and lo > 1:
                        continue
                    units, r = self._custom[k](self, txt or "", ref or "")
                    self.total_retries += r
                    for i, (okind, otext, oref) in enumerate(units):
                        emit(d, off, sidx, i, okind, otext, oref, r if i == 0 else 0)
                elif k == spec.KIND_HTML:
                    emit(d, off, sidx, 0, spec.OUT_HTML_TEXT, self._html_text(txt or ""), "", 0)
                elif k == spec.KIND_PDF_REF:
                    for p in range(lo, hi + 1):
                        text, r = self._ocr_unit(ref, p)
                        self.total_retries += r
                        emit(d, off, sidx, p, spec.OUT_PDF_PAGE, text, ref, r)
                elif k == spec.KIND_IMAGE_REF:
                    text, r = self._ocr_unit(ref, 1)
                    self.total_retries += r
                    emit(d, off, sidx, 0, spec.OUT_IMAGE_TEXT, text, ref, r)
                elif k == spec.KIND_DOCX_REF:
                    paras, tables = synth.media_docx(ref)
                    emit(d, off, sidx, 0, spec.OUT_DOCX_TEXT, self._docx_text(paras, tables), ref, 0)
                elif k == spec.KIND_EMPTY_SENTINEL:
                    emit(d, off, sidx, 0, spec.KIND_EMPTY_SENTINEL, "", "", 0)
                else:  # unknown kind: pass through (default path, app.py:645)
                    emit(d, off, sidx, 0, spec.OUT_TEXT, txt or "", ref or "", 0)

            parts.append(pa.table(out, schema=OUT_SCHEMA))

        if not parts:
            return OUT_SCHEMA.empty_table()
        return pa.concat_tables(parts).combine_chunks()
