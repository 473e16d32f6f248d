"""Greedy k-center coreset over the embedding table."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import kcenter_rows
from ocr_engine_ray.pipelines.ann import kcenter_coreset, kcenter_digest

SF_GATE = "/root/testdata/sf0.01"


def _computed(sf: str) -> tuple[int, int]:
    """Round-5: the twin is COMPUTED SQL (`_kcenter_sql`) — run it."""
    import duckdb

    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS"
        f" SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    return con.execute(e.oracle_sql()["kcenter_digest"]).fetchone()


def test_computed_twin_matches_oracle():
    # two scales: proves the twin genuinely recomputes
    assert _computed(SF_GATE) == kcenter_rows(SF_GATE)
    assert _computed("/root/testdata/sf0.001") == kcenter_rows(
        "/root/testdata/sf0.001"
    )


def _write_emb(d, vecs):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestKCenter:
    def test_three_clusters_one_center_each(self, tmp_path):
        # tight clusters at (0,0), (10,0), (0,10): the first three centers
        # must land in three DIFFERENT clusters (the k-center guarantee)
        rng = np.random.default_rng(1)
        vecs, owner = [], []
        for ci, base in enumerate([(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]):
            for _ in range(10):
                vecs.append(
                    [base[0] + rng.uniform(-0.1, 0.1), base[1] + rng.uniform(-0.1, 0.1)]
                )
                owner.append(ci)
        sf = _write_emb(tmp_path / "c", vecs)
        t = kcenter_coreset(sf, k=3)
        picked = [owner[int(c)] for c in t.column("center_id").to_pylist()]
        assert sorted(picked) == [0, 1, 2]

    def test_radii_nonincreasing(self, tmp_path):
        rng = np.random.default_rng(4)
        sf = _write_emb(tmp_path / "r", rng.normal(size=(60, 4)).tolist())
        radii = kcenter_coreset(sf, k=6).column("radius_q").to_pylist()[1:]
        assert all(b <= a for a, b in zip(radii, radii[1:]))

    def test_engine_matches_sequential_twin(self):
        sf = "/root/testdata/sf0.001"
        t = kcenter_digest(sf)
        eng = (t.column("n_centers")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == kcenter_rows(sf)

    def test_shard_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = kcenter_coreset(sf, num_shards=3)
        b = kcenter_coreset(sf, num_shards=8)
        assert a.equals(b)
