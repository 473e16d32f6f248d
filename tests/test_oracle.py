"""Oracle-focused checks + oracle/pipeline agreement on the shared-spec
pure functions (independent implementations, same spec)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_engine_ray import oracle, spec, synth
from ocr_engine_ray.functions import lines as flines

_tok = st.tuples(
    st.text(alphabet="ab -", max_size=4),
    st.sampled_from([0, 1, 2, 3, 4, 5, 99]),
)


class TestImplementationsAgree:
    @settings(max_examples=300, deadline=None)
    @given(st.lists(_tok, max_size=30))
    def test_line_assembly(self, tokens):
        assert flines.assemble_lines(tokens) == oracle._paragraph_lines(tokens)

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(st.text(alphabet="xy |\n ", max_size=6), max_size=5),
        st.lists(
            st.lists(st.lists(st.text(alphabet="c ", max_size=3), max_size=3), max_size=3),
            max_size=2,
        ),
    )
    def test_docx_flatten(self, paras, tables):
        assert flines.docx_to_text(paras, tables) == oracle.docx_flatten(paras, tables)


class TestOracleSemantics:
    def test_pdf_empty_pages_filled(self):
        # every synthesized page — including empty ones — yields a span
        num = 65  # pdf shape
        doc = synth.derive_doc(num, "w1 w2 w3 w4", "en")
        out = oracle.extract_document(doc)
        assert len(out["spans"]) == spec.pdf_page_count(num)
        ref = doc["spans"][0]["media_ref"]
        empties = [
            p for p, page in synth.media_pages(ref, spec.KIND_PDF_REF) if not page
        ]
        for p in empties:
            assert out["spans"][p - 1]["text"] == ""

    def test_order_is_dense_rank_of_offset(self):
        doc = {
            "doc_id": "d",
            "spans": [
                {"kind": "text", "text": "b", "media_ref": "", "offset": 100},
                {"kind": "text", "text": "a", "media_ref": "", "offset": 7},
            ],
        }
        out = oracle.extract_document(doc)
        assert [(s["order"], s["text"]) for s in out["spans"]] == [(0, "a"), (1, "b")]

    def test_media_synthesis_is_deterministic(self):
        a = synth.media_page("media://doc-00000066/0", 3)
        b = synth.media_page("media://doc-00000066/0", 3)
        assert a == b
        pa_, ta = synth.media_docx("media://doc-00000094/0")
        pb, tb = synth.media_docx("media://doc-00000094/0")
        assert (pa_, ta) == (pb, tb)

    def test_derivation_is_deterministic(self):
        assert synth.derive_doc(12, "a b c d", "en") == synth.derive_doc(12, "a b c d", "en")

    def test_out_span_count_formula(self):
        # spec.out_span_count is the SQL-checkable invariant; the oracle must
        # honor it for every derived shape
        for num in range(0, 220):
            doc = synth.derive_doc(num, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9", "en")
            out = oracle.extract_document(doc)
            assert len(out["spans"]) == spec.out_span_count(num), num
