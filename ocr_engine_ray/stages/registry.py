"""Kind → extractor registry (the §2.7 extension point).

An *extractor* turns one input span into its ordered list of extracted
units::

    fn(ctx, text, media_ref) -> (units, retries)
    # units: list[(out_kind, out_text, out_media_ref)], retries: int

``ctx`` is the stateful worker (``DocExtractor``) — it exposes the per-actor
model clients (``ctx.ocr_unit(ref, page)`` with the retry ladder,
``ctx.html_text(html)``, ``ctx.docx_text(paras, tables)``) so custom
extractors can reuse them.  Register a new span kind by passing
``PipelineConfig(extractors={"csv_ref": my_fn})``; pipeline routing then
works unchanged.

Partitioning note: custom kinds are costed at 1 unit by the giant router
(``doc_extract.estimate_unit_counts``), so they always take the row-local
path — user code of unknown cost never triggers the page-explode shuffle.
The built-in pdf path is the only one that fans out.
"""

from __future__ import annotations

from .. import spec, synth


def _extract_text(ctx, text: str, ref: str):
    return [(spec.OUT_TEXT, text or "", "")], 0


def _extract_html(ctx, text: str, ref: str):
    return [(spec.OUT_HTML_TEXT, ctx.html_text(text or ""), "")], 0


def _extract_pdf(ctx, text: str, ref: str):
    units, retries = [], 0
    for p in range(1, synth.media_page_count(ref, spec.KIND_PDF_REF) + 1):
        t, r = ctx.ocr_unit(ref, p)
        retries += r
        units.append((spec.OUT_PDF_PAGE, t, ref))
    return units, retries


def _extract_image(ctx, text: str, ref: str):
    t, r = ctx.ocr_unit(ref, 1)
    return [(spec.OUT_IMAGE_TEXT, t, ref)], r


def _extract_docx(ctx, text: str, ref: str):
    paras, tables = synth.media_docx(ref)
    return [(spec.OUT_DOCX_TEXT, ctx.docx_text(paras, tables), ref)], 0


def passthrough(ctx, text: str, ref: str):
    """Unknown kind: pass through as text (default path, app.py:645)."""
    return [(spec.OUT_TEXT, text or "", ref or "")], 0


def default_extractors() -> dict:
    return {
        spec.KIND_TEXT: _extract_text,
        spec.KIND_HTML: _extract_html,
        spec.KIND_PDF_REF: _extract_pdf,
        spec.KIND_IMAGE_REF: _extract_image,
        spec.KIND_DOCX_REF: _extract_docx,
    }
