"""Row-local document extraction (the no-shuffle fast path).

``DocExtractor`` processes a WHOLE interleaved document inside one actor call:
sort its spans by ``offset``, extract every unit in order, build the output
span list and fold fields — no explode, no shuffle, output rows go straight
to the sink.

Why both paths exist (cost-model routing, see pipelines/extraction.py):

- the reference's semantics are strictly per-document, so a document whose
  total extraction cost is small is best processed row-locally — shuffling
  its spans through the cluster just to re-sort them is pure overhead;
- a document whose media units are individually expensive (real OCR is
  ~0.1-10 s/page; a 500-page PDF is minutes of work) MUST be split across
  workers — that is the explode → actor-pool → groupby-reassemble path
  (stages/extract.py + stages/reassemble.py).

The router decides per document on an *estimated output-unit count*
(``giant_unit_threshold``), i.e. a cost model.  With the deterministic
stand-in OCR (~0.3 ms/page) the threshold is high; with a real model it
would be a handful of pages.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import spec, synth
from ..functions import html as fhtml
from ..functions import lines as flines
from ..functions.fields import fold_unit_text
from .extract import SpanExtractor
from .reassemble import RESULT_SCHEMA


def estimate_unit_counts(batch: pa.Table) -> np.ndarray:
    """Per-doc estimated output-unit count (pdf_ref → page count, others 1).

    Page counts come from the media synthesizer's arithmetic page-count
    function — the analog of cheap metadata (a PDF page count is readable
    from its header without rasterizing anything).
    """
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(spans)
    kinds = pc.struct_field(flat, "kind").to_pylist()
    refs = pc.struct_field(flat, "media_ref").to_pylist()
    units = np.fromiter(
        (
            synth.media_page_count(r, spec.KIND_PDF_REF) if k == spec.KIND_PDF_REF else 1
            for k, r in zip(kinds, refs)
        ),
        dtype=np.int64,
        count=len(kinds),
    )
    out = np.zeros(batch.num_rows, dtype=np.int64)
    np.add.at(out, parent, units)
    return out


def split_by_units(batch: pa.Table, *, threshold: int, keep_giant: bool) -> pa.Table:
    """Filter an interleaved batch to giant (or non-giant) documents."""
    est = estimate_unit_counts(batch)
    mask = est > threshold if keep_giant else est <= threshold
    return batch.filter(pa.array(mask))


_TASK_EXTRACTORS: dict = {}


def doc_extract_task(batch: pa.Table) -> pa.Table:
    """Task-mode wrapper: same extraction, stateless-task compute strategy.

    State ("model load") is cached once per worker process in a module
    global — the task analog of actor ``__init__`` amortization.  Tasks fuse
    with the upstream derive/read chain and share CPU slots freely, which
    beats a dedicated actor pool when the per-unit model cost is small (the
    pool's reserved slots starve upstream stages at low CPU counts).  For a
    heavyweight model (GBs of weights, GPU), use the actor-pool mode
    (``compute='actors'``) instead.
    """
    if None not in _TASK_EXTRACTORS:
        _TASK_EXTRACTORS[None] = DocExtractor()
    return _TASK_EXTRACTORS[None](batch)


def make_doc_extract_task(config):
    """Task-mode wrapper bound to a :class:`PipelineConfig` (custom extractor
    registry); worker-side state cached per config fingerprint."""
    key = config.fingerprint()
    extractors = config.extractors

    def task(batch: pa.Table) -> pa.Table:
        if key not in _TASK_EXTRACTORS:
            _TASK_EXTRACTORS[key] = DocExtractor(extractors=extractors)
        return _TASK_EXTRACTORS[key](batch)

    return task


class DocExtractor:
    """Actor-pool stage: interleaved doc rows → final extracted rows.

    Same stateful-worker architecture as ``SpanExtractor`` (stand-in model
    bound once per actor; per-batch Arrow in/out) but operating per document.
    Semantics are identical to explode→extract→reassemble — asserted by the
    pipeline-vs-oracle equality tests, which run both paths.

    Per-kind dispatch goes through the extractor registry
    (stages/registry.py); pass ``extractors={...}`` to add or override kinds
    (the §2.7 extension surface).
    """

    def __init__(self, extractors: dict | None = None) -> None:
        from .registry import default_extractors, passthrough

        self._inner = SpanExtractor()  # shares the unit extractors + retry ladder
        self._html = fhtml.extract_main_text
        self._docx = flines.docx_to_text
        self._extractors = {**default_extractors(), **(extractors or {})}
        self._fallback = passthrough

    # -- worker context exposed to registry extractors --------------------
    def ocr_unit(self, ref: str, page_no: int) -> tuple[str, int]:
        return self._inner._ocr_unit(ref, page_no)

    def html_text(self, html: str) -> str:
        return self._html(html)

    def docx_text(self, paras, tables) -> str:
        return self._docx(paras, tables)

    def _extract_doc(self, doc_spans: list[dict]) -> tuple[list, str, int, int]:
        # Null tolerance (spec, matches oracle): null offset → 0, strings → "".
        cleaned = [
            {
                "kind": s.get("kind") or "",
                "text": s.get("text") or "",
                "media_ref": s.get("media_ref") or "",
                "offset": s.get("offset") or 0,
            }
            for s in doc_spans
        ]
        ordered = sorted(enumerate(cleaned), key=lambda t: (t[1]["offset"], t[0]))
        out: list[tuple[str, str, str]] = []
        retries = 0
        for _, s in ordered:
            fn = self._extractors.get(s["kind"], self._fallback)
            units, r = fn(self, s["text"], s["media_ref"])
            retries += r
            out.extend(units)
        merged: dict[str, str] = {}
        total_chars = 0
        for _, t, _ in out:
            total_chars += len(t)
            fold_unit_text(merged, t)
        return out, json.dumps(merged, sort_keys=True, ensure_ascii=False), total_chars, retries

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        span_rows: list[dict] = []
        offsets = [0]
        fields_json: list[str] = []
        n_spans: list[int] = []
        total_chars: list[int] = []
        ocr_retries: list[int] = []
        for spans in spans_col:
            out, fj, chars, retr = self._extract_doc(spans or [])
            for order, (k, t, r) in enumerate(out):
                span_rows.append({"kind": k, "text": t, "media_ref": r, "order": order})
            offsets.append(len(span_rows))
            fields_json.append(fj)
            n_spans.append(len(out))
            total_chars.append(chars)
            ocr_retries.append(retr)
        struct = pa.array(span_rows, type=RESULT_SCHEMA.field("spans").type.value_type)
        spans_list = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "spans": spans_list,
                "fields_json": pa.array(fields_json, pa.string()),
                "n_spans": pa.array(n_spans, pa.int32()),
                "total_chars": pa.array(total_chars, pa.int64()),
                "ocr_retries": pa.array(ocr_retries, pa.int32()),
            },
            schema=RESULT_SCHEMA,
        )
