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
