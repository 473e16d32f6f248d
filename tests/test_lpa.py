"""Label-propagation communities (pipelines/graph.py)."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import lpa_labels
from ocr_engine_ray.pipelines.graph import lpa_communities_digest

SF = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["lpa_communities_digest"])
    assert len(nums) == 3
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == lpa_labels(SF_GATE)


@pytest.fixture()
def planted_sf(tmp_path):
    """Two 3-cliques joined by one bridge edge: LPA must find exactly the
    two cliques (the bridge can't outvote two in-clique neighbors).
    Each edge needs support 2 → two orders per edge."""
    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
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
class TestLpa:
    def test_planted_two_cliques(self, planted_sf):
        row = lpa_communities_digest(planted_sf).to_pylist()[0]
        want = lpa_labels(planted_sf)
        assert (row["n_nodes"], row["n_communities"], row["digest"]) == want
        assert row["n_nodes"] == 6
        assert row["n_communities"] == 2

    def test_pipeline_matches_oracle_both_scales(self):
        for sf in (SF, SF_GATE):
            row = lpa_communities_digest(sf).to_pylist()[0]
            assert (
                row["n_nodes"],
                row["n_communities"],
                row["digest"],
            ) == lpa_labels(sf), sf

    def test_shard_count_invariance(self, planted_sf):
        a = lpa_communities_digest(planted_sf, num_shards=2).to_pylist()
        b = lpa_communities_digest(planted_sf, num_shards=16).to_pylist()
        assert a == b
