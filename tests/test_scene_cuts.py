"""Video scene-cut detection plan."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray import spec
from ocr_engine_ray.pipelines.extract_stats import (
    VIDEO_SCENE_SALT,
    VIDEO_SCENE_THRESHOLD,
    video_scene_cuts,
)
from ocr_engine_ray.stages.multimodal import fake_video_frames


def _naive(doc: int):
    nf = fake_video_frames(doc)
    sig = [
        (spec.h32(doc * 1024 + f, VIDEO_SCENE_SALT)) % 256 for f in range(nf)
    ]
    cuts = [
        f for f in range(1, nf) if abs(sig[f] - sig[f - 1]) > VIDEO_SCENE_THRESHOLD
    ]
    return nf, len(cuts), (cuts[0] if cuts else -1)


@pytest.mark.usefixtures("ray_session")
class TestSceneCuts:
    def test_matches_naive_h32(self, tmp_path):
        d = tmp_path / "v"
        d.mkdir()
        ids = [10, 11, 115, 212, 319, 17]
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64())}),
            str(d / "documents.parquet"),
        )
        got = {r["doc_id"]: r for r in video_scene_cuts(str(d)).take_all()}
        assert set(got) == set(ids)
        for doc in ids:
            nf, nc, fc = _naive(doc)
            r = got[doc]
            assert (r["n_frames"], r["n_cuts"], r["first_cut"]) == (nf, nc, fc)
        # the signature space must actually produce cuts somewhere
        assert any(r["n_cuts"] > 0 for r in got.values())

    def test_band_filter(self, tmp_path):
        d = tmp_path / "b"
        d.mkdir()
        pq.write_table(
            pa.table({"doc_id": pa.array([5, 25, 50], pa.int64())}),
            str(d / "documents.parquet"),
        )
        assert video_scene_cuts(str(d)).count() == 0
