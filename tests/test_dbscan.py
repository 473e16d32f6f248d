"""DBSCAN density clustering (pipelines/dedup.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.dedup import dbscan_clusters

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def planted_sf(tmp_path):
    """Hand-solvable density structure in 2-d (cosine radius 0.38 ⇒
    angular radius ~67°; vectors on the unit circle at chosen angles):

    cluster around 0°:  ids 0,1,2 at 0°/20°/40° — all mutually within
    radius → three core points, one cluster (id 0)
    border: id 3 at 95° — within radius of id 2 (55°) only → 1 neighbor
    → border, attached to cluster 0
    noise:  id 4 at 200° — nobody within radius
    """
    angles = {0: 0.0, 1: 20.0, 2: 40.0, 3: 95.0, 4: 200.0}
    vecs = {
        k: [float(np.cos(np.radians(a))), float(np.sin(np.radians(a)))]
        for k, a in angles.items()
    }
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(sorted(vecs), pa.int64()),
                "embedding": pa.array(
                    [vecs[k] for k in sorted(vecs)], pa.list_(pa.float32())
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestDbscan:
    def test_planted_roles(self, planted_sf):
        rows = {
            r["vec_id"]: (r["role"], r["cluster_id"])
            for r in dbscan_clusters(planted_sf).take_all()
        }
        assert rows[0] == ("core", 0)
        assert rows[1] == ("core", 0)
        assert rows[2] == ("core", 0)
        assert rows[3] == ("border", 0)
        assert rows[4] == ("noise", -1)

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = dbscan_clusters(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
        )
        want = con.execute(e.oracle_sql()["dbscan_clusters"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        roles = set(got.role)
        assert roles == {"core", "border", "noise"}  # non-degenerate

    def test_block_and_bucket_invariance(self, planted_sf):
        a = dbscan_clusters(planted_sf, block_rows=2, num_buckets=3).take_all()
        b = dbscan_clusters(planted_sf, block_rows=2048, num_buckets=32).take_all()
        assert a == b
