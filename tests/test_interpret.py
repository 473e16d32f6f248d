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

    def test_digest_literals_match_oracle(self):
        """The SQL-literal digests pinned in __ray_entry__.oracle_sql() must
        equal an oracle-side recomputation over the driver-gate table
        (sf0.01 documents — same 500-row table as sf0.001).  This is the
        guard that keeps the pinned literals honest: they come from the
        independent per-doc oracle, not from the Ray pipeline."""
        import re
        import sys

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry
        from scripts.gen_digest_oracle import oracle_digests

        got = oracle_digests("/root/testdata/sf0.01")
        sql = entry.oracle_sql()
        for name, want in got.items():
            m = re.search(r"SELECT (\d+)::BIGINT AS digest", sql[name])
            assert m, name
            assert int(m.group(1)) == want, name

    def test_pipeline_digest_matches_literal(self):
        """End-to-end: the Ray-side digest queries equal the oracle-pinned
        literals (the same comparison the driver gate runs)."""
        from ocr_engine_ray.pipelines.interpret import rich_fields_digest
        from ocr_engine_ray.pipelines.modes import vocab_fields_digest
        from scripts.gen_digest_oracle import oracle_digests

        want = oracle_digests("/root/testdata/sf0.001")
        sf = "/root/testdata/sf0.001"
        assert rich_fields_digest(sf).column("digest").to_pylist() == [
            want["rich_fields_digest"]
        ]
        assert vocab_fields_digest(sf).column("digest").to_pylist() == [
            want["vocab_fields_digest"]
        ]

    def test_sf0001_text_surface_goldens(self):
        """Corpus-level golden hashes for the full rich/free TEXT surfaces
        (content is media-stream-derived, so the driver gate can only see
        structural projections — free_text_stats; these hashes pin the text
        bytes against synth/oracle co-drift).  Regenerate ONLY for an
        intentional spec change."""
        import hashlib

        from ocr_engine_ray.pipelines.interpret import free_text, rich_fields

        rows = sorted(
            (r["doc_id"], r["fields_rich_json"])
            for r in rich_fields("/root/testdata/sf0.001", num_buckets=8).take_all()
        )
        assert (
            hashlib.sha256(repr(rows).encode()).hexdigest()
            == "9c2ec463e9d1bb6a812cce9d2654187a965d7eef82c0b0a446a43dcb65cd1c99"
        )
        rows2 = sorted(
            (r["doc_id"], r["text"])
            for r in free_text("/root/testdata/sf0.001", num_buckets=8).take_all()
        )
        assert (
            hashlib.sha256(repr(rows2).encode()).hexdigest()
            == "ffa995fb222ea2a22d25552f1fb988bdb7bb8dc5c4e2460047839f258735cf75"
        )
