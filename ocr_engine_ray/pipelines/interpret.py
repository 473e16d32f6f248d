"""Interpretation-stage pipelines: service-mode rich fields + free-text mode.

These complete the reference's output surfaces (SURVEY.md §2.5/§3):

- ``rich_fields``: the service response shape — per document,
  ``{key: {value, conf, source}}`` with conf clamping and substring-based
  page-provenance repair (``source = "<doc_id>#page N"``, first page whose
  text contains the value, default 1; app.py:606-630).  The "LLM" is the
  deterministic fold of per-unit ``Label: value`` lines; the normalization
  logic (M4/M12) is the reference's, re-implemented in
  ``functions.fields.normalize_rich_fields``.
- ``free_text``: the CLI free-text mode — per document, extracted units
  rendered as ``[Page i]\\n{text}`` blocks joined by blank lines, trailing
  whitespace stripped (ocr_any.py:308-321: ``f"[Page {i}]\\n{page_text}"``
  rstripped per block, ``"\\n\\n".join(...)`` then ``.strip()``).

Both consume the flagship extraction output, so they are per-row transforms
(no extra shuffle).
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa
import ray.data as rd

from ..functions.fields import fold_unit_text, normalize_rich_fields
from .extraction import extract_documents

# Modulus for the corpus digests: sums stay exact int64 in every per-block
# partial AND in the driver fold, at any corpus size.
DIGEST_MOD = (1 << 61) - 1


def row_digest(doc_id: str, payload: str) -> int:
    """Per-row digest term: md5 over the framed (doc_id, payload) pair."""
    h = hashlib.md5(f"{doc_id}\x1f{payload}".encode("utf-8")).digest()
    return int.from_bytes(h, "big") % DIGEST_MOD


def fold_digest(ds: rd.Dataset, payload_col: str) -> pa.Table:
    """Order-independent corpus digest of a (doc_id, <payload_col>) surface:
    sum of per-row md5 terms mod 2^61-1, as a 1-row ``{digest: int64}``.

    Scale shape: one map pass emits ONE partial-sum row per block; only
    block-count scalars reach the driver (no sort, no row data on the
    driver).  Commutative addition makes the result independent of block
    layout and row order."""

    def partial(batch: pa.Table) -> pa.Table:
        s = 0
        for d, p in zip(
            batch.column("doc_id").to_pylist(), batch.column(payload_col).to_pylist()
        ):
            s = (s + row_digest(str(d), p or "")) % DIGEST_MOD
        return pa.table({"h": pa.array([s], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = sum(r["h"] for r in parts) % DIGEST_MOD
    return pa.table({"digest": pa.array([total], pa.int64())})


def _doc_rich_fields(
    doc_id: str, spans: list[dict], fields_json: str | None = None
) -> str:
    pages = [(s["order"] + 1, s["text"]) for s in spans]
    # The extraction row already carries the identical merge_keep_longer
    # fold in fields_json (same fold_unit_text over the same unit texts in
    # the same order) — reuse it instead of re-parsing every span text;
    # only the provenance repair below genuinely needs the pages.
    if fields_json is not None:
        raw: dict[str, str] = json.loads(fields_json)
    else:
        raw = {}
        for _, text in pages:
            fold_unit_text(raw, text)
    # Stand-in "model output": {value, conf} records with no source — the
    # normalization pass (M4/M12) clamps conf and repairs provenance by
    # substring-searching the doc's own pages.
    rich = normalize_rich_fields(
        {k: {"value": v, "conf": 0.5} for k, v in raw.items()}, doc_id, pages
    )
    return json.dumps(rich, sort_keys=True, ensure_ascii=False)


def _doc_free_text(spans: list[dict]) -> str:
    blocks = [
        f"[Page {s['order'] + 1}]\n{s['text']}".rstrip() for s in spans
    ]
    return "\n\n".join(blocks).strip()


def _rich_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    spans = batch.column("spans").to_pylist()
    fjs = (
        batch.column("fields_json").to_pylist()
        if "fields_json" in batch.column_names
        else [None] * len(ids)
    )
    rich = [_doc_rich_fields(d, s, f) for d, s, f in zip(ids, spans, fjs)]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "fields_rich_json": pa.array(rich, pa.string()),
        }
    )


def _free_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    spans = batch.column("spans").to_pylist()
    texts = [_doc_free_text(s) for s in spans]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def rich_fields_from_extraction(out: rd.Dataset) -> rd.Dataset:
    return out.map_batches(_rich_batch, batch_format="pyarrow")


def free_text_from_extraction(out: rd.Dataset) -> rd.Dataset:
    return out.map_batches(_free_batch, batch_format="pyarrow")


def rich_fields(sf_dir: str, **kwargs) -> rd.Dataset:
    return rich_fields_from_extraction(
        extract_documents(f"{sf_dir}/documents.parquet", **kwargs)
    )


def free_text(sf_dir: str, **kwargs) -> rd.Dataset:
    return free_text_from_extraction(
        extract_documents(f"{sf_dir}/documents.parquet", **kwargs)
    )


def rich_fields_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Driver-gated golden digest of the rich-fields VALUE surface.

    The per-doc field values derive from blake2b media content streams, so
    ANSI SQL cannot recompute them — but their corpus digest is a constant,
    so the SQL twin is the literal pinned from the ORACLE-side computation
    (``oracle.rich_fields_document`` over the same table; see
    ``scripts/gen_digest_oracle.py`` and ``tests/test_interpret.py``'s
    literal-vs-oracle guard).  This flips the flagship interpretation
    *values* from pytest-only to CORRECTNESS-gated."""
    return fold_digest(rich_fields(sf_dir, **kwargs), "fields_rich_json")


def free_text_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Driver-gated golden digest of the free-text VALUE surface (the full
    assembled '[Page i]' text, media-derived spans included — the part
    `free_text_stats` cannot expose to SQL).  Same pinned-literal pattern as
    `rich_fields_digest`: the literal comes from `oracle.free_text_document`
    via scripts/gen_digest_oracle.py."""
    return fold_digest(free_text(sf_dir, **kwargs), "text")


def free_text_stats(sf_dir: str, **kwargs) -> rd.Dataset:
    """The driver-gated projection of the free-text surface — per doc,
    every structural quantity an ANSI-SQL oracle can recompute exactly:

    - ``n_blocks``: one "[Page i]" block per extracted span (doc_id
      arithmetic = OUT_SPAN_COUNT_SQL);
    - ``header_chars``: Σ len(f"[Page {i}]") for i = 1..n_blocks
      = 8B + max(0, B-9) + max(0, B-99) for B ≤ 999;
    - ``inline_chars``: chars of spans whose text derives from the inline
      document text (text / html_text kinds) — media-derived text (pdf
      pages, image OCR, docx) is content-stream data SQL cannot see, so it
      is excluded here and pinned by the pytest golden surface instead.
    """
    import numpy as np
    import pyarrow.compute as pc

    from .. import spec

    out = extract_documents(f"{sf_dir}/documents.parquet", **kwargs)

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        nums = np.array([int(d.rsplit("-", 1)[1]) for d in ids], dtype=np.int64)
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        kinds = pc.struct_field(flat, "kind")
        lens = pc.utf8_length(pc.struct_field(flat, "text")).to_numpy(
            zero_copy_only=False
        )
        inline_mask = pc.is_in(
            kinds, value_set=pa.array([spec.OUT_TEXT, spec.OUT_HTML_TEXT])
        ).to_numpy(zero_copy_only=False)
        inline = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(inline, parent[inline_mask], lens[inline_mask])
        b = batch.column("n_spans").to_numpy(zero_copy_only=False).astype(np.int64)
        header = 8 * b + np.maximum(0, b - 9) + np.maximum(0, b - 99)
        return pa.table(
            {
                "doc_id": pa.array(nums, pa.int64()),
                "n_blocks": pa.array(b, pa.int64()),
                "header_chars": pa.array(header, pa.int64()),
                "inline_chars": pa.array(inline, pa.int64()),
            }
        )

    return out.map_batches(stats, batch_format="pyarrow")


def field_provenance_histogram(sf_dir: str, **kwargs) -> rd.Dataset:
    """Distribution of FIELD PROVENANCE over the rich-fields surface:
    for every extracted field label, how many documents attribute the
    value to each page (the ``{doc_id}#page N`` provenance the
    normalization pass repairs by substring search — reference
    app.py:606-630 semantics).  The page histogram is the corpus-level
    audit of that repair machinery: a label whose mass sits on page 1
    is header-like; mass spread across pages means the fold is picking
    values from body text.

    Scale shape: one pass over the extraction output (the same streaming
    `rich_fields` pipeline), per-batch (label, page, n) combined
    partials, tiny groupby.  Returns (label, page, n_docs) sorted —
    gated via `field_provenance_digest`, pinned from the per-doc oracle
    (`oracle.rich_fields_document`) like every interpretation surface.
    """
    import json as _json

    import numpy as np
    from ray.data.aggregate import Sum

    ds = rich_fields(sf_dir, **kwargs)

    def partials(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, int], int] = {}
        for doc_id, js in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("fields_rich_json").to_pylist(),
        ):
            for label, rec in _json.loads(js or "{}").items():
                src = rec.get("source") or ""
                page = int(src.rsplit("#page ", 1)[1]) if "#page " in src else 0
                key = (label, page)
                counts[key] = counts.get(key, 0) + 1
        ks = sorted(counts)
        return pa.table(
            {
                "label": pa.array([k[0] for k in ks], pa.string()),
                "page": pa.array([k[1] for k in ks], pa.int64()),
                "n_docs": pa.array([counts[k] for k in ks], pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "page"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .sort(["label", "page"])
    )


def field_provenance_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `field_provenance_histogram`: (n_rows, digest)."""
    rows = field_provenance_histogram(sf_dir).take_all()
    dg = 0
    for r in rows:
        dg = (
            dg + row_digest(f"{r['label']}\x1f{r['page']}", str(r["n_docs"]))
        ) % DIGEST_MOD
    return pa.table(
        {
            "n_rows": pa.array([len(rows)], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )
