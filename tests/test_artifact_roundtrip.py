"""Interleaved-table artifact round-trip + checkpoint determinism."""

from __future__ import annotations

import hashlib
import json

import pytest

from ocr_engine_ray.pipelines.extraction import (
    extract_documents,
    extract_from_interleaved,
    materialize_interleaved,
)
from ocr_engine_ray.sources.tables import read_table
from ocr_engine_ray.state.checkpoint import run_checkpointed

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _result_hash(rows) -> str:
    canon = sorted(
        (
            r["doc_id"],
            json.dumps(
                [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]],
                ensure_ascii=False,
            ),
            r["fields_json"],
        )
        for r in rows
    )
    return hashlib.md5(str(canon).encode("utf-8")).hexdigest()


@pytest.mark.usefixtures("ray_session")
class TestArtifactRoundTrip:
    def test_extraction_from_materialized_table_matches_on_the_fly(self, tmp_path):
        art = str(tmp_path / "interleaved")
        materialize_interleaved(DOCS, art)
        from_artifact = extract_from_interleaved(read_table(art), num_buckets=8)
        on_the_fly = extract_documents(DOCS, num_buckets=8)
        assert _result_hash(from_artifact.take_all()) == _result_hash(
            on_the_fly.take_all()
        )


@pytest.mark.usefixtures("ray_session")
class TestCheckpointDeterminism:
    def test_two_runs_byte_equal(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        outs = []
        for name in ("a", "b"):
            out = str(tmp_path / name)
            run_checkpointed(DOCS, out, num_partitions=3, num_buckets=8)
            parts = [pq.read_table(f"{out}/part={k}") for k in range(3)]
            t = pa.concat_tables(parts)
            rows = t.to_pylist()
            outs.append(_result_hash(rows))
        assert outs[0] == outs[1]


class TestRealMediaDecode:
    def test_real_decode_under_pil(self):
        """Activate-on-deps seam: skipped where PIL is absent; the moment the
        dep exists, MediaDecoder(use_fake=False)._decode_real is exercised
        against a real in-memory PNG (so the seam is never dead code)."""
        pytest.importorskip("PIL")
        import io

        import pyarrow as pa
        from PIL import Image

        from ocr_engine_ray.stages.multimodal import MediaDecoder

        buf = io.BytesIO()
        Image.new("RGB", (31, 17)).save(buf, format="PNG")
        batch = pa.table(
            {
                "doc_id": pa.array(["doc-00000080"], pa.string()),
                "media_ref": pa.array(["media://doc-00000080/0"], pa.string()),
                "media_blob": pa.array([buf.getvalue()], pa.binary()),
            }
        )
        out = MediaDecoder(use_fake=False)(batch)
        assert out.column("width").to_pylist() == [31]
        assert out.column("height").to_pylist() == [17]
        assert out.column("format").to_pylist() == ["png"]
        assert out.column("media_idx").to_pylist() == [0]

    def test_pdf_rasterize_real(self):
        """Activate-on-deps seam for the PDF path (reference
        ocr_any.py:308-320): skipped where PyMuPDF is absent; the moment the
        dep exists, a real in-memory one-page PDF is rasterized at the
        reference's zoom=2.5 / alpha=False semantics."""
        pytest.importorskip("fitz")
        from ocr_engine_ray.stages.multimodal import rasterize_pdf_pages

        # minimal valid single-page PDF (100x80pt MediaBox), no xref needed
        # (fitz repairs); hand-built so the test needs no extra deps
        pdf = (
            b"%PDF-1.1\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 100 80] >>"
            b" endobj\n"
            b"trailer << /Root 1 0 R >>\n"
        )
        pages = rasterize_pdf_pages(pdf, zoom=2.5)
        assert len(pages) == 1
        p = pages[0]
        assert p["page"] == 1
        # 100x80pt at zoom 2.5 → 250x200 px, RGB8 (3 bytes/px, alpha=False)
        assert (p["width"], p["height"]) == (250, 200)
        assert len(p["rgb"]) == p["width"] * p["height"] * 3

    def test_docx_image_parts_real(self):
        """Activate-on-deps seam for the DOCX OPC image-rel walk (reference
        ocr_any.py:361-385): skipped where python-docx is absent."""
        docx_mod = pytest.importorskip("docx")
        import base64
        import io

        from ocr_engine_ray.stages.multimodal import docx_image_parts

        # 1x1 red PNG (python-docx parses the header natively, no PIL)
        png = base64.b64decode(
            "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4"
            "nGP4z8DwHwAFAAH/q842iQAAAABJRU5ErkJggg=="
        )
        d = docx_mod.Document()
        d.add_picture(io.BytesIO(png))
        buf = io.BytesIO()
        d.save(buf)
        parts = docx_image_parts(buf.getvalue())
        assert len(parts) == 1
        assert parts[0]["ext"] == "png"
        assert parts[0]["mime"] == "image/png"
        assert parts[0]["blob"] == png
        assert parts[0]["idx"] == 0

    def test_pdf_docx_kernels_gated_loudly(self):
        """Where the deps are absent, the real kernels fail loudly with
        NotImplementedError (never silently fake)."""
        from ocr_engine_ray.stages import multimodal

        if not multimodal._HAVE_FITZ:
            with pytest.raises(NotImplementedError):
                multimodal.rasterize_pdf_pages(b"%PDF-1.1")
        if not multimodal._HAVE_DOCX:
            with pytest.raises(NotImplementedError):
                multimodal.docx_image_parts(b"PK")

    def test_real_decode_requires_blob_column(self):
        """The use_fake=False path fails loudly (not silently fake) when the
        binary payload column is missing or PIL is absent."""
        from ocr_engine_ray.stages import multimodal

        if not multimodal._HAVE_PIL:
            with pytest.raises(NotImplementedError):
                multimodal.MediaDecoder(use_fake=False)
        else:
            import pyarrow as pa

            dec = multimodal.MediaDecoder(use_fake=False)
            batch = pa.table(
                {
                    "doc_id": pa.array(["doc-00000080"], pa.string()),
                    "media_ref": pa.array(["media://doc-00000080/0"], pa.string()),
                }
            )
            with pytest.raises(ValueError):
                dec(batch)
