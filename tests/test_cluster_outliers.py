"""Per-cluster embedding distance-outlier QA."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import cluster_outlier_rows
from ocr_engine_ray.pipelines.ann import cluster_outlier_digest, cluster_outlier_stats

SF = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["cluster_outlier_digest"])
    assert len(nums) == 2
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == cluster_outlier_rows(SF_GATE)


def _write_emb(d, vecs):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestClusterOutliers:
    def test_engine_matches_sequential_oracle(self):
        t = cluster_outlier_digest(SF)
        eng = (t.column("n_rows")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == cluster_outlier_rows(SF)

    def test_planted_outlier_flagged(self, tmp_path):
        # two tight blobs + one far point per blob
        rng = np.random.default_rng(5)
        a = rng.normal(0.0, 0.01, size=(20, 4))
        b = rng.normal(1.0, 0.01, size=(20, 4)) * np.array([1, -1, 1, -1])
        out_a = np.full((1, 4), 0.4)
        vecs = np.vstack([a, out_a, b])
        sf = _write_emb(tmp_path / "o", vecs)
        t = cluster_outlier_stats(sf, k=2, iters=5)
        rows = t.to_pylist()
        assert sum(r["n_outliers"] for r in rows) >= 1
        assert sum(r["n_vectors"] for r in rows) == len(vecs)

    def test_uniform_cluster_no_outliers(self, tmp_path):
        # all points equidistant-ish: nothing beyond 4x median
        vecs = [[float(i % 2), float((i // 2) % 2)] for i in range(16)]
        sf = _write_emb(tmp_path / "u", vecs)
        t = cluster_outlier_stats(sf, k=2, iters=3)
        assert all(r["n_outliers"] == 0 for r in t.to_pylist())

    def test_ppm_consistency(self):
        for r in cluster_outlier_stats(SF).to_pylist():
            assert r["outlier_ppm"] == r["n_outliers"] * 1_000_000 // r["n_vectors"]
