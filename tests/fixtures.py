"""Unit-test fixture tables (FIXTURES.md §1): derived docs + pinned edge cases.

Everything is a deterministic pure function — no RNG state, no wall clock.
"""

from __future__ import annotations

import pyarrow as pa

from ocr_engine_ray import spec, synth
from ocr_engine_ray.stages.ingest import INTERLEAVED_SCHEMA

# A word-salad corpus line (mirrors the driver documents table's style).
_TEXT = (
    "the fast key order sort table scan merge part window small hash scan "
    "join order batch batch batch stream spark window window dup data row"
)


def derived_docs(n: int = 64, base: int = 0) -> list[dict]:
    """n docs spanning every shape class (doc_num = base..base+n-1)."""
    out = []
    for i in range(base, base + n):
        # vary text deterministically: rotate words
        words = _TEXT.split(" ")
        rot = i % len(words)
        text = " ".join(words[rot:] + words[:rot])
        out.append(synth.derive_doc(i, text, ["en", "hi", "de"][i % 3]))
    return out


def edge_docs() -> list[dict]:
    """Pinned mandatory edge cases (FIXTURES.md §1)."""

    def span(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    return [
        # empty spans list
        {"doc_id": "doc-90000000", "lang": "en", "spans": []},
        # only empty-text spans
        {
            "doc_id": "doc-90000001",
            "lang": "en",
            "spans": [span("text", "", "", 3), span("text", "", "", 9)],
        },
        # offsets with gaps AND stored shuffled (restored only via sort)
        {
            "doc_id": "doc-90000002",
            "lang": "en",
            "spans": [
                span("text", "third", "", 50),
                span("text", "first", "", 2),
                span("text", "second", "", 17),
            ],
        },
        # Devanagari text span
        {
            "doc_id": "doc-90000003",
            "lang": "hi",
            "spans": [span("text", "स्वीकृत क्षेत्रफल ४२ वर्ग मीटर", "", 0)],
        },
        # merge_keep_longer tie: equal-length values → earlier span must win;
        # falsy-valued line must be skipped
        {
            "doc_id": "doc-90000004",
            "lang": "en",
            "spans": [
                span("text", "Loan Type: aaa", "", 1),
                span("text", "Loan Type: bbb", "", 2),   # tie → earlier wins
                span("text", "Pin Code: ", "", 3),        # no value → regex miss
                span("text", "Plot Area: bigger-value", "", 4),
                span("text", "Plot Area: tiny", "", 5),   # shorter → earlier kept
            ],
        },
        # braces / code-fence content (JSON-extraction robustness)
        {
            "doc_id": "doc-90000005",
            "lang": "en",
            "spans": [span("text", 'prefix {"a": 1, "b": "x"} ```fence``` suffix', "", 0)],
        },
        # html with everything to strip
        {
            "doc_id": "doc-90000006",
            "lang": "en",
            "spans": [
                span(
                    "html",
                    synth.html_wrap("doc-90000006", ["real content here", "and a second para"]),
                    "",
                    0,
                )
            ],
        },
        # interleaved media + text with shuffled storage order
        {
            "doc_id": "doc-90000007",
            "lang": "en",
            "spans": [
                span("image_ref", "", "media://doc-90000007/0", 12),
                span("text", "before image", "", 4),
                span("docx_ref", "", "media://doc-90000007/1", 20),
            ],
        },
        # unknown kind → pass-through default
        {
            "doc_id": "doc-90000008",
            "lang": "en",
            "spans": [span("mystery", "kept as-is", "ref://x", 0)],
        },
        # nulls everywhere (spec: null offset → 0, null strings → "")
        {
            "doc_id": "doc-90000009",
            "lang": "en",
            "spans": [
                {"kind": None, "text": None, "media_ref": None, "offset": None},
                span("text", "after the null", "", 7),
            ],
        },
        # malformed pdf media_ref → zero pages, doc must still survive
        {
            "doc_id": "doc-90000010",
            "lang": "en",
            "spans": [span("pdf_ref", "", "not-a-media-ref", 0)],
        },
        # DUPLICATE offsets: ties must keep storage order (the oracle's
        # (offset, original index) rule — requires span_idx through the
        # distributed path's shuffle)
        {
            "doc_id": "doc-90000011",
            "lang": "en",
            "spans": [
                span("text", "tie-A", "", 5),
                span("text", "tie-B", "", 5),
                span("image_ref", "", "media://doc-90000011/0", 5),
                span("text", "before", "", 1),
            ],
        },
    ]


def unit_docs() -> list[dict]:
    return derived_docs(64) + edge_docs()


def unit_table(docs: list[dict] | None = None) -> pa.Table:
    return pa.Table.from_pylist(docs or unit_docs(), schema=INTERLEAVED_SCHEMA)
