"""Mode pipelines — the reference's env-switch surfaces as config-driven
Ray Data stages (VERDICT r1 "What's missing" #1/#2, SURVEY §2.7).

``apply_modes_batch`` is one vectorizable post-extraction stage applying:

- **redaction** (``OCR_REDACT`` analog): every extracted unit's text goes
  through :func:`functions.redact.mask_sensitive` BEFORE field folding —
  the reference puts the redaction guide in the OCR system prompt
  (ocr_any.py:44-48), so structured extraction sees masked text; applying a
  pure masking function to each extracted unit is the deterministic
  equivalent.
- **translation** (``OCR_TRANSLATE_ALWAYS`` / ``OCR_LANG=hi``): the prompt
  dispatch of ocr_any.py:434-438 as a config predicate; the translate
  stand-in is identity on text (C5) but marks each span, so the count
  surface is exact.
- **field vocabulary**: when ``config.field_labels`` is set, field folding
  keeps only the requested keys — the service's per-request
  ``fields_to_extract`` (app.py:703-716) / the CLI's fixed INTAKE_FIELDS
  (ocr_any.py:78-123).

``run_pipeline`` mirrors the CLI ``main()`` dispatch (ocr_any.py:438-470):
``config.structured`` selects rich-fields JSON vs free-text output.

Everything here is a per-row transform over the extraction output — no
added shuffle at any scale.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..config import DEFAULT_FIELD_LABELS, PipelineConfig
from ..functions.fields import fold_unit_text
from ..functions.redact import mask_sensitive
from ..stages.reassemble import RESULT_SCHEMA
from .extraction import extract_documents

MODES_SCHEMA = pa.schema(
    list(RESULT_SCHEMA)
    + [
        pa.field("n_translated", pa.int32()),
        pa.field("n_redactions", pa.int32()),
    ]
)


def apply_modes_batch(batch: pa.Table, *, config: PipelineConfig) -> pa.Table:
    """Extraction-output rows → mode-processed rows (MODES_SCHEMA)."""
    vocab = config.vocabulary()
    translate_all = config.translate_active
    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans").to_pylist()
    fields_col = batch.column("fields_json").to_pylist()

    span_rows: list[dict] = []
    offsets = [0]
    out_fields: list[str] = []
    n_translated: list[int] = []
    n_redactions: list[int] = []
    total_chars: list[int] = []
    for spans, fields_json in zip(spans_col, fields_col):
        spans = spans or []
        red = 0
        chars = 0
        # Reference dispatch parity (ocr_any.py ocr_image_dataurl_text):
        # OCR_TRANSLATE_ALWAYS replaces the system prompt entirely, so the
        # model never sees the redaction guide when both are set —
        # translate_always therefore OVERRIDES redact here too.
        if config.redact and not translate_all:
            masked_spans = []
            for s in spans:
                t, n = mask_sensitive(s["text"] or "")
                red += n
                chars += len(t)
                masked_spans.append({**s, "text": t})
            spans = masked_spans
            # Re-fold fields from the masked text (the reference's model
            # would only ever have seen masked text) — the shared fold, so
            # tie semantics can't drift from the extraction surfaces.
            merged: dict[str, str] = {}
            for s in spans:
                fold_unit_text(merged, s["text"])
        else:
            chars = sum(len(s["text"] or "") for s in spans)
            merged = json.loads(fields_json or "{}")
        if vocab is not None:
            merged = {k: v for k, v in merged.items() if k in vocab}
        span_rows.extend(spans)
        offsets.append(len(span_rows))
        out_fields.append(json.dumps(merged, sort_keys=True, ensure_ascii=False))
        n_translated.append(len(spans) if translate_all else 0)
        n_redactions.append(red)
        total_chars.append(chars)

    struct = pa.array(span_rows, type=RESULT_SCHEMA.field("spans").type.value_type)
    spans_list = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": spans_list,
            "fields_json": pa.array(out_fields, pa.string()),
            "n_spans": batch.column("n_spans"),
            "total_chars": pa.array(total_chars, pa.int64()),
            "ocr_retries": batch.column("ocr_retries"),
            "n_translated": pa.array(n_translated, pa.int32()),
            "n_redactions": pa.array(n_redactions, pa.int32()),
        },
        schema=MODES_SCHEMA,
    )


def extract_with_config(sf_dir: str, config: PipelineConfig) -> rd.Dataset:
    """documents parquet → extraction → mode stage, per ``config``."""
    out = extract_documents(
        f"{sf_dir}/documents.parquet", config=config, **config.extraction_kwargs()
    )
    return out.map_batches(
        apply_modes_batch, batch_format="pyarrow", fn_kwargs={"config": config}
    )


def run_pipeline(sf_dir: str, config: PipelineConfig) -> rd.Dataset:
    """The CLI main() dispatch (ocr_any.py:438-470): structured mode returns
    the per-doc rich JSON surface, free-text mode the page-block text."""
    from .interpret import free_text_from_extraction, rich_fields_from_extraction

    out = extract_with_config(sf_dir, config)
    if config.structured:
        return rich_fields_from_extraction(out)
    return free_text_from_extraction(out)


# ---------------------------------------------------------------------------
# Driver queries (oracle-gated)
# ---------------------------------------------------------------------------


def mode_translate_counts(sf_dir: str) -> pa.Table:
    """Span-translation counts under the three translation-relevant configs
    (default en, lang=hi, translate_always).  Exact SQL twin: translated
    span counts are pure doc_id arithmetic.

    The three pipeline runs share one streaming shape; rows:
    (mode, n_docs, n_spans, n_translated).
    """
    from ray.data.aggregate import Count, Sum

    rows = []
    for mode, cfg in [
        ("default", PipelineConfig()),
        ("lang_hi", PipelineConfig(lang="hi")),
        ("translate_always", PipelineConfig(translate_always=True)),
    ]:
        agg = extract_with_config(sf_dir, cfg).aggregate(
            Count(alias_name="n_docs"),
            Sum("n_spans", alias_name="n_spans"),
            Sum("n_translated", alias_name="n_translated"),
        )
        rows.append(
            {
                "mode": mode,
                "n_docs": int(agg["n_docs"]),
                "n_spans": int(agg["n_spans"]),
                "n_translated": int(agg["n_translated"]),
            }
        )
    return pa.table(
        {
            "mode": pa.array([r["mode"] for r in rows], pa.string()),
            "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
            "n_spans": pa.array([r["n_spans"] for r in rows], pa.int64()),
            "n_translated": pa.array([r["n_translated"] for r in rows], pa.int64()),
        }
    )


def mode_redact_inline(sf_dir: str) -> rd.Dataset:
    """Redact-mode invariants on the inline-only shapes, per doc: the clean
    synthetic corpus has no digit-bearing tokens, so redaction must fire 0
    times and keep every char count — the SQL twin recomputes both from the
    documents table (length preservation + no false positives)."""
    import pyarrow.compute as pc

    out = extract_with_config(sf_dir, PipelineConfig(redact=True))

    def stats(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        nums = np.array([int(d.rsplit("-", 1)[1]) for d in doc_ids], dtype=np.int64)
        m = nums % 100
        keep = (m < 65).nonzero()[0]  # short_text + html only
        t = batch.take(pa.array(keep, pa.int64()))
        return pa.table(
            {
                "doc_id": pa.array(nums[keep], pa.int64()),
                "n_redactions": pc.cast(t.column("n_redactions"), pa.int64()),
                "total_chars": t.column("total_chars"),
            }
        )

    return out.map_batches(stats, batch_format="pyarrow")


def vocab_fields(sf_dir: str) -> rd.Dataset:
    """Fixed-vocabulary structured extraction (INTAKE_FIELDS analog): per
    doc, the requested-key hit count and the filtered JSON.  Field content
    derives from the media streams (not SQL-recomputable) → rows-only gate;
    exactness is pinned by the planted-vocabulary pytest."""
    out = extract_with_config(
        sf_dir, PipelineConfig(field_labels=DEFAULT_FIELD_LABELS)
    )

    def stats(batch: pa.Table) -> pa.Table:
        fields = batch.column("fields_json").to_pylist()
        n = [len(json.loads(f or "{}")) for f in fields]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_vocab_fields": pa.array(n, pa.int64()),
                "fields_json": batch.column("fields_json"),
            }
        )

    return out.map_batches(stats, batch_format="pyarrow")


def vocab_fields_digest(sf_dir: str) -> pa.Table:
    """Driver-gated golden digest of the fixed-vocabulary structured-field
    VALUE surface (see ``interpret.rich_fields_digest`` for the scheme; the
    SQL twin literal is pinned from ``oracle.vocab_fields_document``)."""
    from .interpret import fold_digest

    return fold_digest(vocab_fields(sf_dir), "fields_json")


def intake_vocabulary(sf_dir: str) -> pa.Table:
    """The request-vocabulary → schema-key surface (app.py:193-212 /
    app.py:703-716) as data: (key, label) rows for the default vocabulary.
    The SQL twin spells the expected mapping literally, pinning
    label_to_key's slugging end-to-end."""
    cfg = PipelineConfig(field_labels=DEFAULT_FIELD_LABELS)
    vocab = cfg.vocabulary() or {}
    keys = sorted(vocab)
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "label": pa.array([vocab[k] for k in keys], pa.string()),
        }
    )
