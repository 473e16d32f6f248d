"""Model-call plumbing analogs (ladders, response flattening, MIME map) and
the fold order-sensitivity property (SURVEY.md §5.3c)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_engine_ray import oracle
from ocr_engine_ray.functions.fields import fold_fields
from ocr_engine_ray.functions.model import (
    extract_output_text,
    mime_from_docx_ext,
    refusal_retry,
    structured_call_ladder,
    text_maybe_translate,
    translate_to_english,
)


class TestExtractOutputText:
    def test_output_text_wins(self):
        assert extract_output_text({"output_text": " hi ", "output": []}) == "hi"

    def test_message_parts_joined(self):
        resp = {
            "output": [
                {"type": "message", "content": [{"type": "output_text", "text": "a"}]},
                {"type": "reasoning"},
                {"type": "message", "content": [{"type": "text", "text": "b"}, {"type": "x"}]},
            ]
        }
        assert extract_output_text(resp) == "a\nb"

    def test_empty(self):
        assert extract_output_text({}) == ""


class TestStructuredLadder:
    def test_schema_success(self):
        out = structured_call_ladder(lambda: {"a": 1}, lambda: "no", lambda: "no")
        assert out == {"a": 1}

    def test_schema_typeerror_falls_through(self):
        def boom():
            raise TypeError("no response_format")

        out = structured_call_ladder(boom, lambda: 'x {"b": 2} y', lambda: "no")
        assert out == {"b": 2}

    def test_schema_empty_then_text(self):
        out = structured_call_ladder(lambda: None, lambda: '{"c": 3}', lambda: "no")
        assert out == {"c": 3}

    def test_fallback_model_last(self):
        out = structured_call_ladder(lambda: None, lambda: "prose", lambda: '{"d": 4}')
        assert out == {"d": 4}

    def test_total_failure_empty(self):
        assert structured_call_ladder(lambda: None, lambda: "x", lambda: "y") == {}


class TestRefusalRetry:
    def test_no_refusal(self):
        assert refusal_retry(lambda: "total 42", lambda: "fb") == ("total 42", False)

    def test_refusal_uses_fallback(self):
        assert refusal_retry(lambda: "I'm sorry, I cannot assist", lambda: "ok") == (
            "ok",
            True,
        )


class TestMimeMap:
    def test_known(self):
        assert mime_from_docx_ext(".JPG") == "image/jpeg"
        assert mime_from_docx_ext("tif") == "image/tiff"

    def test_default_png(self):
        assert mime_from_docx_ext("webp") == "image/png"
        assert mime_from_docx_ext("") == "image/png"


class TestTranslateNoOps:
    def test_identity(self):
        assert translate_to_english("नमस्ते") == "नमस्ते"
        assert text_maybe_translate("x", True) == "x"


# ------------------------------------------------------------------ property
_val = st.text(alphabet="ab", max_size=4)
_unit = st.dictionaries(st.sampled_from(["k1", "k2", "k3"]), _val, max_size=3)


class TestFoldOrderSensitivity:
    @settings(max_examples=200, deadline=None)
    @given(st.lists(_unit, max_size=5), st.data())
    def test_permutation_changes_iff_oracle_says(self, units, data):
        """Permuting unit order changes the fold exactly when the oracle's
        sequential merge_keep_longer says it does (SURVEY.md §5.3c)."""
        perm = data.draw(st.permutations(list(range(len(units)))))
        a = fold_fields(units)
        b = fold_fields([units[i] for i in perm])

        def oracle_fold(seq):
            out: dict = {}
            for d in seq:
                out = oracle.merge_keep_longer(out, d)
            return out

        oa = oracle_fold(units)
        ob = oracle_fold([units[i] for i in perm])
        assert a == oa and b == ob
        assert (a == b) == (oa == ob)
