"""One-row dataset-card summary."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.textstats import dataset_card


@pytest.mark.usefixtures("ray_session")
class TestDatasetCard:
    def test_components_agree_with_component_ops(self, ray_session):
        import ray.data  # noqa: F401

        from ocr_engine_ray.pipelines.decontam import (
            c4_quality_filters,
            gopher_quality_flags,
        )
        from ocr_engine_ray.pipelines.dedup import dedup_rate_by_source

        sf = "/root/testdata/sf0.001"
        card = dataset_card(sf).take_all()[0]
        assert card["n_docs"] == 500
        gop = sum(1 for r in gopher_quality_flags(sf).take_all() if r["gopher_pass"])
        assert card["gopher_pass_ppm"] == gop * 1_000_000 // 500
        c4 = sum(1 for r in c4_quality_filters(sf).take_all() if r["c4_keep"])
        assert card["c4_keep_ppm"] == c4 * 1_000_000 // 500
        per_src = dedup_rate_by_source(sf).take_all()
        assert card["n_sources"] == len(per_src)
        # NOTE: Σ per-source distinct ≥ global distinct (a text shared by
        # two sources counts once globally); assert the bound
        assert card["n_distinct_texts"] <= sum(r["n_distinct"] for r in per_src)

    def test_planted_card(self, tmp_path):
        d = tmp_path / "c"
        d.mkdir()
        texts = ["a b c", "a b c", "x y"]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "source": pa.array(["s1", "s1", "s2"], pa.string()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        card = dataset_card(str(d)).take_all()[0]
        assert card["n_docs"] == 3
        assert card["n_tokens"] == 8
        assert card["n_sources"] == 2
        assert card["n_distinct_texts"] == 2
        assert card["dup_rate_ppm"] == 1_000_000 // 3
        assert card["gopher_pass_ppm"] == 0  # all docs far below 50 words
        assert card["c4_keep_ppm"] == 0
