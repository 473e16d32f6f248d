"""§2.7 config surface: redact / translate / structured modes, field
vocabulary, extractor registry (reference: ocr_any.py:21-28 env switches,
app.py:703-716 per-request labels, ocr_any.py:78-123 INTAKE_FIELDS)."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.config import DEFAULT_FIELD_LABELS, PipelineConfig
from ocr_engine_ray.functions.redact import mask_sensitive


# ---------------------------------------------------------------- units


class TestRedactUnit:
    def test_pan_masking(self):
        t, n = mask_sensitive("id ABCDE1234F ok")
        assert t == "id XXXXX1234X ok" and n == 1

    def test_long_number_keeps_last4(self):
        t, n = mask_sensitive("aadhaar 123456789012 end")
        assert t == "aadhaar XXXXXXXX9012 end" and n == 1

    def test_mixed_digit_token(self):
        t, n = mask_sensitive("acct No-12-34-56x")
        assert n == 1 and t.endswith("-56x") and t.startswith("acct XXXX")

    def test_clean_text_untouched(self):
        s = "plain words only, one 42 and 7,4.0 stay"
        t, n = mask_sensitive(s)
        assert t == s and n == 0

    def test_length_preserving(self):
        for s in ["x 1234567 y", "ABCDE1234F", "a 99999 99999999 b"]:
            t, _ = mask_sensitive(s)
            assert len(t) == len(s)


class TestConfig:
    def test_from_env(self):
        cfg = PipelineConfig.from_env(
            {"OCR_LANG": "HI", "OCR_REDACT": "true", "OCR_STRUCTURED": "false"}
        )
        assert cfg.lang == "hi" and cfg.redact and not cfg.structured
        assert cfg.translate_active  # lang=hi forces translation

    def test_lang_fallback(self):
        assert PipelineConfig(lang="fr").lang == "en"  # ocr_any.py:21-23

    def test_vocabulary_keys(self):
        v = PipelineConfig(field_labels=DEFAULT_FIELD_LABELS).vocabulary()
        assert v["applicant_name"] == "Applicant Name"
        assert v["pin_code"] == "PIN Code"
        assert PipelineConfig().vocabulary() is None


# ---------------------------------------------------------------- pipeline

# doc_nums < 40 (mod 100) are short_text; doc 0 → 1 chunk, doc 1 → 2 chunks.
_PLANTED = [
    (0, "Applicant Name: ABCDE1234F"),
    (3, "PIN Code: 560001 extra words here"),
    (6, "Unknown Label: 123456789012 trailing"),
    (9, "no fields just plain words"),
]


@pytest.fixture()
def planted_sf(tmp_path):
    rows = [
        {"doc_id": n, "text": t, "lang": "en", "source": "s", "n_chars": len(t)}
        for n, t in _PLANTED
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestModePipelines:
    def test_redact_and_vocab_end_to_end(self, planted_sf):
        from ocr_engine_ray.pipelines.modes import extract_with_config

        cfg = PipelineConfig(redact=True, field_labels=DEFAULT_FIELD_LABELS)
        rows = {r["doc_id"]: r for r in extract_with_config(planted_sf, cfg).take_all()}
        f0 = json.loads(rows["doc-00000000"]["fields_json"])
        assert f0 == {"applicant_name": "XXXXX1234X"}  # PAN masked, key kept
        assert rows["doc-00000000"]["n_redactions"] == 1
        f3 = json.loads(rows["doc-00000003"]["fields_json"])
        assert f3["pin_code"] == "XX0001 extra words here"  # 560001 → XX0001
        # 'unknown_label' is outside the vocabulary → dropped
        assert json.loads(rows["doc-00000006"]["fields_json"]) == {}
        assert rows["doc-00000006"]["n_redactions"] == 1
        assert json.loads(rows["doc-00000009"]["fields_json"]) == {}
        # redaction is length-preserving
        for n, t in _PLANTED:
            did = f"doc-{n:08d}"
            assert rows[did]["total_chars"] == len(t)

    def test_open_vocab_keeps_unknown_label(self, planted_sf):
        from ocr_engine_ray.pipelines.modes import extract_with_config

        cfg = PipelineConfig(redact=True)  # open vocabulary
        rows = {r["doc_id"]: r for r in extract_with_config(planted_sf, cfg).take_all()}
        f6 = json.loads(rows["doc-00000006"]["fields_json"])
        assert f6["unknown_label"] == "XXXXXXXX9012 trailing"

    def test_translate_counts(self, planted_sf):
        from ocr_engine_ray.pipelines.modes import extract_with_config

        base = extract_with_config(planted_sf, PipelineConfig()).take_all()
        assert all(r["n_translated"] == 0 for r in base)
        always = extract_with_config(
            planted_sf, PipelineConfig(translate_always=True)
        ).take_all()
        assert all(r["n_translated"] == r["n_spans"] for r in always)
        hi = extract_with_config(planted_sf, PipelineConfig(lang="hi")).take_all()
        assert all(r["n_translated"] == r["n_spans"] for r in hi)

    def test_modes_identical_across_paths(self, planted_sf):
        """Redact+vocab output must be identical on the row-local and the
        distributed (explode→reassemble) extraction paths."""
        from ocr_engine_ray.pipelines.modes import extract_with_config

        cfg_local = PipelineConfig(redact=True, field_labels=DEFAULT_FIELD_LABELS)
        cfg_dist = cfg_local.with_(giant_unit_threshold=0, num_buckets=4)
        a = sorted(
            extract_with_config(planted_sf, cfg_local).take_all(),
            key=lambda r: r["doc_id"],
        )
        b = sorted(
            extract_with_config(planted_sf, cfg_dist).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert a == b

    def test_structured_dispatch(self, planted_sf):
        from ocr_engine_ray.pipelines.modes import run_pipeline

        rich = run_pipeline(planted_sf, PipelineConfig(structured=True)).take_all()
        assert "fields_rich_json" in rich[0]
        free = run_pipeline(planted_sf, PipelineConfig(structured=False)).take_all()
        assert "text" in free[0] and free[0]["text"].startswith("[Page 1]")

    def test_custom_extractor_registry(self):
        import ray.data as rd

        from ocr_engine_ray.pipelines.extraction import extract_from_interleaved

        def csv_extractor(ctx, text, ref):
            return [("csv_row", c, "") for c in (text or "").split(",")], 0

        span_t = pa.array(
            [
                [
                    {"kind": "csv_ref", "text": "a,b,c", "media_ref": "", "offset": 0},
                    {"kind": "text", "text": "tail", "media_ref": "", "offset": 4},
                ]
            ]
        )
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(["doc-00000000"], pa.string()),
                    "lang": pa.array(["en"], pa.string()),
                    "spans": span_t,
                }
            )
        )
        cfg = PipelineConfig(extractors={"csv_ref": csv_extractor})
        expected = [
            ("csv_row", "a"),
            ("csv_row", "b"),
            ("csv_row", "c"),
            ("text", "tail"),
        ]
        rows = extract_from_interleaved(ds, config=cfg).take_all()
        assert [(s["kind"], s["text"]) for s in rows[0]["spans"]] == expected
        # actor-pool mode threads the registry via fn_constructor_kwargs
        cfg_a = cfg.with_(compute="actors")
        rows_a = extract_from_interleaved(
            ds, config=cfg_a, compute="actors", extract_concurrency=(1, 2)
        ).take_all()
        assert [(s["kind"], s["text"]) for s in rows_a[0]["spans"]] == expected

    def test_custom_extractor_on_giant_path(self, ray_session):
        """Regression: custom kinds used to fall into the unknown-kind
        passthrough on the distributed explode path, so the same doc
        produced different spans depending on routing.  Both paths must now
        dispatch the registry identically (giant_unit_threshold=0 forces
        the explode path for everything)."""
        import ray.data as rd

        from ocr_engine_ray.pipelines.extraction import extract_from_interleaved

        def csv_extractor(ctx, text, ref):
            return [("csv_row", c, "") for c in (text or "").split(",")], 0

        span_t = pa.array(
            [
                [
                    {"kind": "csv_ref", "text": "a,b,c", "media_ref": "", "offset": 0},
                    {"kind": "text", "text": "tail", "media_ref": "", "offset": 4},
                ]
            ]
        )
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(["doc-00000000"], pa.string()),
                    "lang": pa.array(["en"], pa.string()),
                    "spans": span_t,
                }
            )
        )
        cfg = PipelineConfig(extractors={"csv_ref": csv_extractor})
        expected = [
            ("csv_row", "a"),
            ("csv_row", "b"),
            ("csv_row", "c"),
            ("text", "tail"),
        ]
        for compute in ("tasks", "actors"):
            rows = extract_from_interleaved(
                ds,
                config=cfg,
                compute=compute,
                giant_unit_threshold=0,
                num_buckets=2,
                **({"extract_concurrency": (1, 2)} if compute == "actors" else {}),
            ).take_all()
            assert [(s["kind"], s["text"]) for s in rows[0]["spans"]] == expected, compute

    def test_translate_always_overrides_redact(self, ray_session, tmp_path):
        """Reference dispatch parity: OCR_TRANSLATE_ALWAYS replaces the
        system prompt entirely, so the model never sees the redaction guide
        when both switches are on — the combined config must translate
        without masking."""
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines.modes import extract_with_config

        rows = [
            {
                "doc_id": 0,
                "text": "account 12345678 flagged",
                "lang": "en",
                "source": "s",
                "n_chars": 0,
            }
        ]
        d = tmp_path / "m"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))

        both = extract_with_config(
            str(d), PipelineConfig(redact=True, translate_always=True)
        ).take_all()
        assert all(r["n_redactions"] == 0 for r in both)
        assert all(r["n_translated"] == r["n_spans"] for r in both)
        joined = " ".join(s["text"] for r in both for s in r["spans"])
        assert "12345678" in joined  # untouched by the redaction guide

        red_only = extract_with_config(
            str(d), PipelineConfig(redact=True)
        ).take_all()
        assert sum(r["n_redactions"] for r in red_only) > 0
        joined_r = " ".join(s["text"] for r in red_only for s in r["spans"])
        assert "XXXX5678" in joined_r
