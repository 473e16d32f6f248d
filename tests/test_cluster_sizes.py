"""Near-dup cluster-size distribution."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.dedup import dup_cluster_sizes


def _write(d, vecs):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestDupClusterSizes:
    def test_planted_distribution(self, tmp_path):
        rng = np.random.default_rng(2)
        base = rng.normal(size=(3, 12))
        vecs = []
        vecs += [base[0] + rng.normal(scale=1e-3, size=12) for _ in range(3)]  # 3-cluster
        vecs += [base[1] + rng.normal(scale=1e-3, size=12) for _ in range(2)]  # pair
        eye = np.eye(12)
        vecs += [eye[i] * 9 for i in range(4)]  # 4 singletons
        sf = _write(tmp_path / "d", vecs)
        got = {r["cluster_size"]: r for r in dup_cluster_sizes(sf).take_all()}
        assert got[1]["n_clusters"] == 4 and got[1]["n_vectors"] == 4
        assert got[2]["n_clusters"] == 1 and got[2]["n_vectors"] == 2
        assert got[3]["n_clusters"] == 1 and got[3]["n_vectors"] == 3
        # mass balance: total vectors accounted
        assert sum(r["n_vectors"] for r in got.values()) == len(vecs)

    def test_all_singletons(self, tmp_path):
        eye = np.eye(8)
        sf = _write(tmp_path / "s", [eye[i] * 5 for i in range(8)])
        got = dup_cluster_sizes(sf).take_all()
        assert got == [{"cluster_size": 1, "n_clusters": 8, "n_vectors": 8}]
