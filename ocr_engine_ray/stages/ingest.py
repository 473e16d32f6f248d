"""Ingest stages: documents → interleaved docs → exploded span rows.

All stages are stateless ``map_batches`` transforms over Arrow batches
(``batch_format="pyarrow"``).  The explode uses ``pyarrow.compute``
list kernels (``list_flatten`` / ``list_parent_indices``) so the common path
never loops over rows in Python; only the (rare) pdf_ref rows take a Python
loop to emit page-shard work units.

Page sharding: a pdf_ref span is split into shards of ``spec.PDF_SHARD_PAGES``
pages *before* the OCR actor stage.  This is the skew defense demanded by the
north rule — a 500-page giant PDF becomes ~20 independent work rows that
spread across the cluster instead of pinning one worker (the reference blocks
a whole gunicorn worker per PDF for up to 1800 s, app.py:351).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import spec, synth

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

INTERLEAVED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("lang", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

EXPLODED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("span_idx", pa.int32()),  # within-doc storage position: offset-tie break
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("page_lo", pa.int32()),
        ("page_hi", pa.int32()),
    ]
)


def derive_interleaved_batch(batch: pa.Table) -> pa.Table:
    """``documents`` rows → north-rule interleaved rows (synth.derive_doc)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    rows = [synth.derive_doc(int(d), t or "", l or "") for d, t, l in zip(doc_ids, texts, langs)]
    return pa.Table.from_pylist(rows, schema=INTERLEAVED_SCHEMA)


def explode_spans_batch(batch: pa.Table) -> pa.Table:
    """Interleaved rows → one row per span (pdf_ref spans → one row per
    page shard of ``PDF_SHARD_PAGES`` pages)."""
    if batch.num_rows == 0:
        return EXPLODED_SCHEMA.empty_table()
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()

    # Documents with an empty spans list → sentinel rows (kept through the
    # fan-out so the doc reappears with an empty extracted span list).
    lengths = pc.list_value_length(spans)
    empty_mask = pc.equal(pc.fill_null(lengths, 0), 0)
    sentinel = None
    if pc.any(empty_mask).as_py():
        empty_ids = pc.filter(batch.column("doc_id"), empty_mask)
        m = len(empty_ids)
        sentinel = pa.table(
            {
                "doc_id": empty_ids,
                "offset": pa.array(np.zeros(m, dtype=np.int32)),
                "span_idx": pa.array(np.zeros(m, dtype=np.int32)),
                "kind": pa.array([spec.KIND_EMPTY_SENTINEL] * m, pa.string()),
                "text": pa.array([""] * m, pa.string()),
                "media_ref": pa.array([""] * m, pa.string()),
                "page_lo": pa.array(np.zeros(m, dtype=np.int32)),
                "page_hi": pa.array(np.zeros(m, dtype=np.int32)),
            },
            schema=EXPLODED_SCHEMA,
        )

    parent = pc.list_parent_indices(spans)
    doc_id = pc.take(batch.column("doc_id"), parent)
    flat = pc.list_flatten(spans)
    # Null tolerance (spec, matches oracle): null offset → 0, strings → "".
    kind = pc.fill_null(pc.struct_field(flat, "kind"), "")
    text = pc.fill_null(pc.struct_field(flat, "text"), "")
    media_ref = pc.fill_null(pc.struct_field(flat, "media_ref"), "")
    offset = pc.fill_null(pc.struct_field(flat, "offset"), pa.scalar(0, pa.int32()))
    # within-doc storage position — the offset-tie break that matches the
    # oracle's (offset, original index) ordering even after the shuffle
    parent_np = parent.to_numpy(zero_copy_only=False)
    lens = pc.fill_null(lengths, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    span_idx = (np.arange(len(parent_np)) - doc_starts[parent_np]).astype(np.int32)

    is_pdf = pc.equal(kind, spec.KIND_PDF_REF)
    n = len(flat)
    zeros = pa.array(np.zeros(n, dtype=np.int32))
    base = pa.table(
        {
            "doc_id": doc_id,
            "offset": offset,
            "span_idx": pa.array(span_idx),
            "kind": kind,
            "text": text,
            "media_ref": media_ref,
            "page_lo": zeros,
            "page_hi": zeros,
        },
        schema=EXPLODED_SCHEMA,
    )
    if not pc.any(is_pdf).as_py():
        if sentinel is not None:
            base = pa.concat_tables([base, sentinel]).combine_chunks()
        return base

    non_pdf = base.filter(pc.invert(is_pdf))
    if sentinel is not None:
        non_pdf = pa.concat_tables([non_pdf, sentinel])
    pdf_rows = base.filter(is_pdf)
    # Python loop over the (minority) pdf spans only: emit page shards.
    out = {k: [] for k in ("doc_id", "offset", "span_idx", "kind", "text", "media_ref", "page_lo", "page_hi")}
    for d, off, sidx, ref in zip(
        pdf_rows.column("doc_id").to_pylist(),
        pdf_rows.column("offset").to_pylist(),
        pdf_rows.column("span_idx").to_pylist(),
        pdf_rows.column("media_ref").to_pylist(),
    ):
        pages = synth.media_page_count(ref, spec.KIND_PDF_REF)
        if pages == 0:
            # zero-page pdf (malformed ref): keep the doc alive via sentinel
            out["doc_id"].append(d)
            out["offset"].append(off)
            out["span_idx"].append(sidx)
            out["kind"].append(spec.KIND_EMPTY_SENTINEL)
            out["text"].append("")
            out["media_ref"].append("")
            out["page_lo"].append(0)
            out["page_hi"].append(0)
            continue
        lo = 1
        while lo <= pages:
            hi = min(lo + spec.PDF_SHARD_PAGES - 1, pages)
            out["doc_id"].append(d)
            out["offset"].append(off)
            out["span_idx"].append(sidx)
            out["kind"].append(spec.KIND_PDF_REF)
            out["text"].append("")
            out["media_ref"].append(ref)
            out["page_lo"].append(lo)
            out["page_hi"].append(hi)
            lo = hi + 1
    shards = pa.table(out, schema=EXPLODED_SCHEMA)
    return pa.concat_tables([non_pdf, shards]).combine_chunks()


def doc_size_class_batch(batch: pa.Table) -> pa.Table:
    """Interleaved rows → (doc_id, size_class, doc_weight).

    ``doc_weight`` = total inline text chars + 50 × synthesized page count —
    the size signal used for skew-aware scheduling; ``size_class`` buckets it
    via ``spec.SIZE_BUCKET_EDGES``.
    """
    spans = batch.column("spans").combine_chunks()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(spans)
    # fill_null BEFORE to_numpy: a null span text otherwise becomes NaN in a
    # float64 array and astype(int64) turns it into int64-min garbage.
    text_len = pc.fill_null(
        pc.utf8_length(pc.struct_field(flat, "text")), 0
    ).to_numpy(zero_copy_only=False)
    kind = pc.struct_field(flat, "kind").to_pylist()
    refs = pc.struct_field(flat, "media_ref").to_pylist()
    pages = np.array(
        [
            synth.media_page_count(r, k) if k in (spec.KIND_PDF_REF,) else 0
            for k, r in zip(kind, refs)
        ],
        dtype=np.int64,
    )
    w = text_len.astype(np.int64) + 50 * pages
    n_docs = batch.num_rows
    weight = np.zeros(n_docs, dtype=np.int64)
    np.add.at(weight, parent, w)
    edges = np.array(spec.SIZE_BUCKET_EDGES, dtype=np.int64)
    size_class = np.searchsorted(edges, weight, side="right").astype(np.int32)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "size_class": pa.array(size_class),
            "doc_weight": pa.array(weight),
        }
    )
