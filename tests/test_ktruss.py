"""Maximal k-truss by distributed edge peeling."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import ktruss_rows
from ocr_engine_ray.pipelines.graph import ktruss_digest, ktruss_edges

SF = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["ktruss_digest"])
    assert len(nums) == 2
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == ktruss_rows(SF_GATE)


def _write_graph(d, edges, *, min_support=1):
    """Build a lineitem table whose co-purchase graph (at the given
    min_support) is exactly `edges`: one order per edge, repeated
    min_support times."""
    d.mkdir(parents=True)
    ok, pk = [], []
    oid = 0
    for a, b in edges:
        for _ in range(min_support):
            oid += 1
            ok += [oid, oid]
            pk += [a, b]
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
class TestKTruss:
    def test_engine_matches_sequential_oracle(self):
        t = ktruss_digest(SF)
        eng = (t.column("n_edges")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == ktruss_rows(SF)

    def test_triangle_plus_tail(self, tmp_path):
        # triangle {1,2,3} with a pendant edge (3,4): the 3-truss keeps
        # the triangle and peels the tail
        sf = _write_graph(
            tmp_path / "t", [(1, 2), (1, 3), (2, 3), (3, 4)], min_support=2
        )
        got = [(r["p1"], r["p2"]) for r in ktruss_edges(sf, k=3).take_all()]
        assert got == [(1, 2), (1, 3), (2, 3)]

    def test_cascading_peel(self, tmp_path):
        # two triangles sharing edge (2,3), plus a wedge 4-5-6 with no
        # triangle: truss keeps both triangles, drops the wedge entirely;
        # k=4 then needs every edge in TWO triangles -> only (2,3) ever
        # has support 2, so the 4-truss is empty (cascade to nothing)
        edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (5, 6), (6, 7)]
        sf = _write_graph(tmp_path / "c", edges, min_support=2)
        got3 = [(r["p1"], r["p2"]) for r in ktruss_edges(sf, k=3).take_all()]
        assert got3 == [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
        got4 = [(r["p1"], r["p2"]) for r in ktruss_edges(sf, k=4).take_all()]
        assert got4 == []

    def test_bucket_invariance(self):
        a = [tuple(r.values()) for r in ktruss_edges(SF, num_buckets=7).take_all()]
        b = [tuple(r.values()) for r in ktruss_edges(SF, num_buckets=64).take_all()]
        assert a == b
