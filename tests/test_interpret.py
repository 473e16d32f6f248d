"""Rich-fields (service mode) and free-text (CLI mode) pipelines vs oracle."""

from __future__ import annotations

import json

import pytest
import ray.data as rd

from ocr_engine_ray import oracle
from ocr_engine_ray.pipelines.interpret import _doc_free_text, _doc_rich_fields

from .fixtures import derived_docs, edge_docs, unit_table


def _pipeline_rows(docs):
    """Run the per-doc interpret transforms on extraction output."""
    from ocr_engine_ray.pipelines.extraction import extract_from_interleaved

    out = extract_from_interleaved(rd.from_arrow(unit_table(docs)), num_buckets=4)
    rows = out.take_all()
    return {
        r["doc_id"]: (
            _doc_rich_fields(r["doc_id"], r["spans"]),
            _doc_free_text(r["spans"]),
        )
        for r in rows
    }


@pytest.mark.usefixtures("ray_session")
class TestInterpret:
    def test_matches_oracle(self):
        docs = derived_docs(48, base=60) + edge_docs()
        got = _pipeline_rows(docs)
        for doc in docs:
            rich, ft = got[doc["doc_id"]]
            assert rich == oracle.rich_fields_document(doc), doc["doc_id"]
            assert ft == oracle.free_text_document(doc), doc["doc_id"]

    def test_rich_field_shape(self):
        docs = [
            {
                "doc_id": "doc-90100000",
                "lang": "en",
                "spans": [
                    {"kind": "text", "text": "filler page", "media_ref": "", "offset": 0},
                    {"kind": "text", "text": "Loan Type: gold-special", "media_ref": "", "offset": 5},
                ],
            }
        ]
        rich, ft = _pipeline_rows(docs)["doc-90100000"]
        obj = json.loads(rich)
        assert obj["loan_type"]["value"] == "gold-special"
        assert obj["loan_type"]["conf"] == 0.5
        # provenance repaired by substring search → page 2 holds the value
        assert obj["loan_type"]["source"] == "doc-90100000#page 2"
        assert ft.startswith("[Page 1]\nfiller page\n\n[Page 2]\n")
