"""Span-sequence reassembly: the pipeline's single shuffle.

Order is DATA here, not an execution property (SURVEY.md §7.4): extracted span
rows arrive in arbitrary block order, carrying ``(offset, sub)``; this stage
restores per-document order and re-nests spans.

Instead of ``groupby("doc_id")`` (one Python call per tiny group — 10^12
groups at target scale), rows are hash-bucketed by ``doc_id`` into
``num_buckets`` coarse partitions and the shuffle runs on the bucket key; each
``map_groups`` call then reassembles *all* documents in its bucket with
vectorized Arrow/numpy kernels (sort → run-length doc boundaries → ListArray
re-nesting).  The per-call cost is amortized over thousands of documents and
``num_buckets`` is sized to the cluster, independent of document count.

The ``merge_keep_longer`` fields fold (ocr_any.py:229-235) is order-sensitive,
so it runs after the in-bucket sort, per document, over the few spans that can
contain ``Label: value`` lines (colon pre-filter).
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import spec
from ..functions.fields import fold_unit_text

OUT_SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("order", pa.int32()),
    ]
)

RESULT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(OUT_SPAN_STRUCT)),
        ("fields_json", pa.string()),
        ("n_spans", pa.int32()),
        ("total_chars", pa.int64()),
        ("ocr_retries", pa.int32()),
    ]
)


_DOC_NUM_RE = r"^doc-\d{1,15}$"


def add_bucket_batch(batch: pa.Table, *, num_buckets: int) -> pa.Table:
    """Append a ``bucket = hash(doc_id) % num_buckets`` column.

    The bucket is a pure function of each doc_id VALUE (never of which batch
    it arrived in): ids matching ``doc-<digits>`` take the vectorized Knuth
    fast path, any other id hashes with crc32 — decided per value, so a
    document whose rows straddle batches always lands in one bucket.
    """
    doc_id = batch.column("doc_id")
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    ok = pc.match_substring_regex(doc_id, _DOC_NUM_RE).to_numpy(zero_copy_only=False)
    if ok.all():
        nums = pc.cast(pc.utf8_slice_codeunits(doc_id, 4, 99), pa.int64())
        mixed = nums.to_numpy(zero_copy_only=False) * 2654435761 % (2 ** 32)
        bucket = (mixed % num_buckets).astype(np.int32)
    else:
        ids = doc_id.to_pylist()
        bucket = np.empty(len(ids), dtype=np.int32)
        for i, (d, is_num) in enumerate(zip(ids, ok)):
            if is_num:
                bucket[i] = (int(d[4:]) * 2654435761 % (2 ** 32)) % num_buckets
            else:
                bucket[i] = zlib.crc32(d.encode()) % num_buckets
    return batch.append_column("bucket", pa.array(bucket))


def reassemble_bucket(group: pa.Table) -> pa.Table:
    """All extracted span rows of one bucket → one row per document."""
    if group.num_rows == 0:
        return RESULT_SCHEMA.empty_table()
    idx = pc.sort_indices(
        group,
        sort_keys=[
            ("doc_id", "ascending"),
            ("offset", "ascending"),
            ("span_idx", "ascending"),  # oracle's offset-tie break
            ("sub", "ascending"),
        ],
    )
    t = group.take(idx).combine_chunks()

    doc_col = t.column("doc_id").combine_chunks()
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    # integer codes for boundary detection (no per-row string comparisons)
    codes = pc.dictionary_encode(doc_col).indices.to_numpy(zero_copy_only=False)
    n = len(codes)
    # run-length document boundaries (over ALL rows incl. empty-doc sentinels)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    counts = ends - starts

    # Empty-doc sentinel rows keep span-less docs alive through the fan-out;
    # exclude them from the span lists but keep their documents.
    keep = pc.invert(
        pc.equal(t.column("kind"), spec.KIND_EMPTY_SENTINEL)
    ).to_numpy(zero_copy_only=False)
    csum = np.cumsum(keep)
    kept_before = csum[starts] - keep[starts]
    counts_kept = np.add.reduceat(keep.astype(np.int64), starts)
    # dense per-doc order over kept rows
    order_full = (csum - 1) - np.repeat(kept_before, counts)
    kept_idx = np.flatnonzero(keep)
    tk = t.take(pa.array(kept_idx)).combine_chunks()

    text_col = tk.column("text").combine_chunks()
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    struct = pa.StructArray.from_arrays(
        [
            tk.column("kind").combine_chunks(),
            text_col,
            tk.column("media_ref").combine_chunks(),
            pa.array(order_full[kept_idx].astype(np.int32)),
        ],
        names=["kind", "text", "media_ref", "order"],
    )
    offsets = pa.array(np.concatenate([[0], np.cumsum(counts_kept)]).astype(np.int32))
    spans_list = pa.ListArray.from_arrays(offsets, struct)

    # fields fold — only rows whose text can contain "Label: value" lines
    # (colon pre-filter: only those texts are materialized to Python)
    has_colon = pc.match_substring(text_col, ":").to_numpy(zero_copy_only=False)
    colon_pos = np.flatnonzero(has_colon)
    colon_texts = text_col.take(pa.array(colon_pos)).to_pylist() if len(colon_pos) else []
    kstarts = np.concatenate([[0], np.cumsum(counts_kept)[:-1]]).astype(np.int64)
    kends = np.cumsum(counts_kept).astype(np.int64)
    lo_pos = np.searchsorted(colon_pos, kstarts, side="left")
    hi_pos = np.searchsorted(colon_pos, kends, side="left")
    fields_json: list[str] = []
    empty = json.dumps({})
    for lo, hi in zip(lo_pos, hi_pos):
        if lo == hi:
            fields_json.append(empty)
            continue
        merged: dict[str, str] = {}
        for i in range(lo, hi):
            fold_unit_text(merged, colon_texts[i])
        fields_json.append(json.dumps(merged, sort_keys=True, ensure_ascii=False))

    chars = pc.utf8_length(text_col).to_numpy(zero_copy_only=False).astype(np.int64)
    total_chars = _reduceat_or_zero(chars, kstarts, kends)
    retr = tk.column("retries").to_numpy(zero_copy_only=False).astype(np.int64)
    retr_sum = _reduceat_or_zero(retr, kstarts, kends)

    return pa.table(
        {
            "doc_id": doc_col.take(pa.array(starts)),
            "spans": spans_list,
            "fields_json": pa.array(fields_json, pa.string()),
            "n_spans": pa.array(counts_kept.astype(np.int32)),
            "total_chars": pa.array(total_chars),
            "ocr_retries": pa.array(retr_sum.astype(np.int32)),
        },
        schema=RESULT_SCHEMA,
    )


def _reduceat_or_zero(vals: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Segment sums that tolerate empty segments (np.add.reduceat misbehaves
    when a segment is empty: it returns vals[start] instead of 0)."""
    c = np.concatenate([[0], np.cumsum(vals)])
    return c[ends] - c[starts]
