"""HyperBall neighborhood function on the co-purchase graph."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import hyperball_rows
from ocr_engine_ray.pipelines.graph import hyperball_digest, hyperball_reach

SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["hyperball_digest"])
    assert len(nums) == 2
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == hyperball_rows(SF_GATE)


@pytest.fixture()
def path_graph_sf(tmp_path):
    """A 5-node path 1-2-3-4-5 (each edge with support 2)."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    ok, pk = [], []
    o = 100
    for a, b in edges:
        for _ in range(2):
            ok.extend([o, o])
            pk.extend([a, b])
            o += 1
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
class TestHyperBall:
    def test_path_graph_monotone_and_exact_small(self, path_graph_sf):
        t = hyperball_reach(path_graph_sf)
        reach = t.column("reach_pairs").to_pylist()
        assert len(reach) == 5  # t = 0..4
        # HLL at these cardinalities (<= 5 per ball) is in the exact
        # linear-counting regime with distinct registers: true values
        # t=0: 5 pairs; t=1: 5+2*4=13; t=2: 5+2*(2+3+4... ) exact pair
        # counts within distance: d<=2: 19; d<=3: 23; d<=4: 25
        assert reach == [5, 13, 19, 23, 25]

    def test_engine_matches_sequential_twin(self, path_graph_sf):
        t = hyperball_digest(path_graph_sf)
        eng = (t.column("n_rounds")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == hyperball_rows(path_graph_sf)

    def test_shard_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = hyperball_reach(sf, num_shards=3)
        b = hyperball_reach(sf, num_shards=16)
        assert a.equals(b)
