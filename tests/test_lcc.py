"""Local clustering coefficients (pipelines/basket.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.basket import (
    clustering_coefficients,
    triangle_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def planted_sf(tmp_path):
    """Co-purchase graph = triangle {1,2,3} + pendant 4 on node 1 (each
    edge from 2 shared orders to clear min_support=2)."""
    orders = [
        (100, [1, 2]), (101, [1, 2]),
        (102, [2, 3]), (103, [2, 3]),
        (104, [1, 3]), (105, [1, 3]),
        (106, [1, 4]), (107, [1, 4]),
    ]
    ok, pk = [], []
    for o, parts in orders:
        for p in parts:
            ok.append(o)
            pk.append(p)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestLcc:
    def test_planted_triangle_with_pendant(self, planted_sf):
        rows = {
            r["part"]: (r["degree"], r["n_tri"], r["lcc_ppm"])
            for r in clustering_coefficients(planted_sf).take_all()
        }
        # node 1: degree 3 (2,3,4), 1 triangle → 2/(3·2) = 1/3
        assert rows[1] == (3, 1, 333333)
        # nodes 2,3: degree 2, 1 triangle → fully clustered
        assert rows[2] == (2, 1, 1000000)
        assert rows[3] == (2, 1, 1000000)
        # pendant node 4: degree 1 → excluded
        assert 4 not in rows

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = clustering_coefficients(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
        )
        want = con.execute(e.oracle_sql()["clustering_coefficients"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_corner_credits_sum_to_three_per_triangle(self):
        df = clustering_coefficients(SF).to_pandas()
        total = triangle_count(SF).to_pylist()[0]["n_triangles"]
        assert int(df.n_tri.sum()) == 3 * total
