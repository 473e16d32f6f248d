"""Pivot-sampled Brandes betweenness on the co-purchase graph."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import betweenness_rows
from ocr_engine_ray.pipelines.graph import BC_GRID, betweenness_digest

SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["betweenness_digest"])
    assert len(nums) == 3
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == betweenness_rows(SF_GATE)


def _write_graph(d, edges):
    """Each edge gets support 2 (two orders)."""
    ok, pk = [], []
    o = 100
    for a, b in edges:
        for _ in range(2):
            ok.extend([o, o])
            pk.extend([a, b])
            o += 1
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestBetweenness:
    def test_path_graph_center_dominates(self, tmp_path):
        # path 1-2-3: with all 3 nodes as pivots, only node 2 carries
        # dependency (it sits on the 1..3 geodesic): B[2] = 2 * 2^30
        # (delta 1.0 from each endpoint pivot), B[1] = B[3] = 0 (dropped)
        sf = _write_graph(tmp_path / "p", [(1, 2), (2, 3)])
        t = betweenness_digest(sf)
        assert t.column("n_nodes")[0].as_py() == 3
        from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

        want = row_digest("2", str(2 * BC_GRID)) % DIGEST_MOD
        assert t.column("digest")[0].as_py() == want

    def test_engine_matches_sequential_twin(self, tmp_path):
        edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6), (2, 7)]
        sf = _write_graph(tmp_path / "m", edges)
        t = betweenness_digest(sf)
        eng = tuple(t.column(c)[0].as_py() for c in ("n_nodes", "n_pivots", "digest"))
        assert eng == betweenness_rows(sf)

    def test_gate_scale_agreement(self):
        sf = "/root/testdata/sf0.001"
        t = betweenness_digest(sf)
        eng = tuple(t.column(c)[0].as_py() for c in ("n_nodes", "n_pivots", "digest"))
        assert eng == betweenness_rows(sf)
