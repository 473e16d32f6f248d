"""Unit tests for the pure operator layer (SURVEY.md §2.2 / §5.2)."""

from __future__ import annotations

from ocr_engine_ray import spec
from ocr_engine_ray.functions.fields import (
    fold_fields,
    normalize_rich_fields,
    parse_unit_fields,
)
from ocr_engine_ray.functions.lines import assemble_lines, docx_to_text, page_to_text
from ocr_engine_ray.functions.textproc import (
    clamp_conf,
    detect_type,
    first_json_object,
    has_devanagari,
    label_to_key,
    looks_like_refusal,
    normalize_lang,
    split_field_labels,
    split_langs,
)

S, SS, EOL, LB, HY, NO = (
    spec.BREAK_SPACE,
    spec.BREAK_SURE_SPACE,
    spec.BREAK_EOL_SURE,
    spec.BREAK_LINE_BREAK,
    spec.BREAK_HYPHEN,
    spec.BREAK_NONE,
)


# ---------------------------------------------------------------- lines
class TestLineAssembly:
    def test_space_breaks(self):
        assert assemble_lines([("a", S), ("b", SS), ("c", LB)]) == ["a b c"]

    def test_line_breaks_flush(self):
        assert assemble_lines([("a", EOL), ("b", LB), ("c", NO)]) == ["a", "b", "c"]

    def test_hyphen_unhandled_is_auto_space(self):
        # HYPHEN(4) is not handled by the reference → plain auto-space concat
        assert assemble_lines([("self", HY), ("made", LB)]) == ["self made"]

    def test_no_break_auto_space(self):
        assert assemble_lines([("a", NO), ("b", NO)]) == ["a b"]

    def test_empty_words_skipped(self):
        assert assemble_lines([("", S), ("a", LB), ("", NO)]) == ["a"]

    def test_empty_line_dropped(self):
        # flush with empty buffer produces no line
        assert assemble_lines([("a", LB), ("b", LB)]) == ["a", "b"]

    def test_tail_stripped(self):
        assert assemble_lines([("a", S)]) == ["a"]

    def test_word_with_trailing_space_suppresses_auto_space(self):
        # buffer ends with " " → no auto-space inserted before next word
        assert assemble_lines([("a ", NO), ("b", LB)]) == ["a b"]

    def test_page_join(self):
        page = [[("a", LB)], [("b", S), ("c", LB)]]
        assert page_to_text(page) == "a\nb c"

    def test_empty_page(self):
        assert page_to_text([]) == ""


# ---------------------------------------------------------------- docx
class TestDocxFlatten:
    def test_paragraphs_then_tables(self):
        # final .strip() (ocr_any.py:359) trims the trailing " | " tail
        out = docx_to_text(["p1", "p2"], [[["a", "b"], ["c", ""]]])
        assert out == "p1\np2\na | b\nc |"

    def test_whitespace_paragraph_dropped(self):
        assert docx_to_text(["  ", "x"], []) == "x"

    def test_all_empty_row_dropped(self):
        assert docx_to_text([], [[["", "  "], ["a", ""]]]) == "a |"

    def test_cells_stripped(self):
        assert docx_to_text([], [[[" a ", " b "]]]) == "a | b"


# ---------------------------------------------------------------- textproc
class TestLabelToKey:
    def test_basic(self):
        assert label_to_key("Applicant Name") == "applicant_name"

    def test_punct_runs_collapse(self):
        assert label_to_key("Land Freehold / Leasehold, term!!") == "land_freehold_leasehold_term"

    def test_empty_fallback(self):
        assert label_to_key("") == "field"
        assert label_to_key("***") == "field"

    def test_unicode_nonascii_to_underscore(self):
        assert label_to_key("Développer’s Name") == "d_velopper_s_name"

    def test_truncate_80(self):
        assert len(label_to_key("x" * 300)) == 80


class TestFirstJsonObject:
    def test_plain(self):
        assert first_json_object('{"a": 1}') == {"a": 1}

    def test_embedded_in_prose(self):
        assert first_json_object('noise {"a": 1} trailing') == {"a": 1}

    def test_greedy_dotall(self):
        # the reference regex is greedy: outermost braces win
        assert first_json_object('{"a": {"b": 2}}') == {"a": {"b": 2}}

    def test_malformed(self):
        assert first_json_object("{not json}") == {}

    def test_empty(self):
        assert first_json_object("") == {}
        assert first_json_object("no braces") == {}


class TestClampConf:
    def test_clamp(self):
        assert clamp_conf(1.5) == 1.0
        assert clamp_conf(-3) == 0.0
        assert clamp_conf(0.25) == 0.25

    def test_non_numeric_default(self):
        assert clamp_conf("high") == 0.5
        assert clamp_conf(None) == 0.5

    def test_numeric_string(self):
        assert clamp_conf("0.7") == 0.7


class TestDetectType:
    def test_pdf_ext(self):
        assert detect_type("a.PDF") == "pdf"

    def test_pdf_magic_overrides_ext(self):
        assert detect_type("a.png", b"%PDF-1.7") == "pdf"

    def test_docx(self):
        assert detect_type("a.docx") == "docx"

    def test_image_mime(self):
        assert detect_type("a.webp") == "image"
        assert detect_type("a.jpeg") == "image"

    def test_default_image(self):
        assert detect_type("a.unknownext") == "image"


class TestLang:
    def test_normalize(self):
        assert normalize_lang(" EN ") == "en"
        assert normalize_lang("hi") == "hi"
        assert normalize_lang("fr") == "en"
        assert normalize_lang("") == "en"

    def test_split_pad_truncate(self):
        assert split_langs("hi, en", 3) == ["hi", "en", "en"]
        assert split_langs("hi en hi hi", 2) == ["hi", "en"]

    def test_split_field_labels(self):
        assert split_field_labels(["A, B;C\nD", " E "]) == ["A", "B", "C", "D", "E"]


class TestPredicates:
    def test_devanagari(self):
        assert has_devanagari("क्षेत्रफल")
        assert not has_devanagari("area")

    def test_refusal(self):
        assert looks_like_refusal("I'm sorry, I cannot assist")
        assert not looks_like_refusal("total area 42")


# ---------------------------------------------------------------- fields
class TestFields:
    def test_parse_unit(self):
        assert parse_unit_fields("Loan Type: gold\nnoise\nPin Code: 560001") == {
            "loan_type": "gold",
            "pin_code": "560001",
        }

    def test_last_wins_within_unit(self):
        assert parse_unit_fields("K A: one\nK A: two") == {"k_a": "two"}

    def test_fold_tie_keeps_earlier(self):
        assert fold_fields([{"k": "aaa"}, {"k": "bbb"}]) == {"k": "aaa"}

    def test_fold_longer_wins(self):
        assert fold_fields([{"k": "aa"}, {"k": "bbb"}]) == {"k": "bbb"}

    def test_fold_falsy_skipped(self):
        assert fold_fields([{"k": ""}, {"k": "x"}, {"j": 0}]) == {"k": "x"}

    def test_normalize_rich_wraps_and_repairs(self):
        pages = [(1, "nothing"), (2, "the value lives here")]
        out = normalize_rich_fields(
            {"a": "value lives", "b": {"value": "lives here", "conf": 7, "source": "bad"}},
            "f.pdf",
            pages,
        )
        # non-dict values are wrapped with conf 0.5 and page 1 (app.py:617)
        assert out["a"] == {"value": "value lives", "conf": 0.5, "source": "f.pdf#page 1"}
        # malformed source repaired by substring search → first page containing
        # the value (app.py:620-628); conf clamped to [0, 1]
        assert out["b"]["conf"] == 1.0
        assert out["b"]["source"] == "f.pdf#page 2"

    def test_normalize_rich_missing_value_defaults_page_1(self):
        out = normalize_rich_fields({"a": {"value": "absent", "conf": 0.2}}, "f", [(1, "x")])
        assert out["a"]["source"] == "f#page 1"


class TestTokenRarityScore:
    def test_planted_counts(self, ray_session, tmp_path):
        """freq_sum = Σ over occurrences of the token's corpus count."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines.textstats import token_rarity_score

        rows = [
            {"doc_id": 0, "text": "a a b", "lang": "en", "source": "s", "n_chars": 5},
            {"doc_id": 1, "text": "a c", "lang": "en", "source": "s", "n_chars": 3},
            {"doc_id": 2, "text": "", "lang": "en", "source": "s", "n_chars": 0},
        ]
        d = tmp_path / "c"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = {r["doc_id"]: r for r in token_rarity_score(str(d)).take_all()}
        # corpus counts: a=3, b=1, c=1
        assert got[0]["n_tokens"] == 3 and got[0]["freq_sum"] == 3 + 3 + 1
        assert got[1]["n_tokens"] == 2 and got[1]["freq_sum"] == 3 + 1
        assert 2 not in got  # tokenless doc emits no row (unnest twin)

    def test_bucket_count_invariance(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines.textstats import token_rarity_score

        rows = [
            {"doc_id": i, "text": f"tok{i % 5} common word{i % 3}", "lang": "en",
             "source": "s", "n_chars": 1}
            for i in range(60)
        ]
        d = tmp_path / "c"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        a = token_rarity_score(str(d), num_buckets=1).take_all()
        b = token_rarity_score(str(d), num_buckets=97).take_all()
        assert a == b
