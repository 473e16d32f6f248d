"""Degree assortativity over the co-purchase graph."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.basket import degree_assortativity

SF = "/root/testdata/sf0.001"


def _write_graph(d, edges):
    d.mkdir(parents=True)
    ok, pk = [], []
    oid = 0
    for a, b in edges:
        for _ in range(2):  # min_support = 2
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


def _naive_r(edges):
    from collections import Counter

    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    stubs = [(deg[a], deg[b]) for a, b in edges] + [(deg[b], deg[a]) for a, b in edges]
    m = len(stubs)
    sx = sum(x for x, _ in stubs)
    sxx = sum(x * x for x, _ in stubs)
    sxy = sum(x * y for x, y in stubs)
    den = m * sxx - sx * sx
    r_ppm = int(np.round(float(m * sxy - sx * sx) / float(den) * 1e6)) if den else 0
    return m, sx, sxx, sxy, r_ppm


@pytest.mark.usefixtures("ray_session")
class TestAssortativity:
    def test_star_is_disassortative(self, tmp_path):
        # star: center degree 4, leaves degree 1 -> r = -1
        edges = [(0, 1), (0, 2), (0, 3), (0, 4)]
        sf = _write_graph(tmp_path / "s", edges)
        r = degree_assortativity(sf).to_pylist()[0]
        m, sx, sxx, sxy, r_ppm = _naive_r(edges)
        assert (r["m_stubs"], r["sx"], r["sxx"], r["sxy"], r["r_ppm"]) == (
            m, sx, sxx, sxy, r_ppm,
        )
        assert r["r_ppm"] == -1_000_000

    def test_regular_graph_degenerate(self, tmp_path):
        # a 4-cycle: all degrees equal -> zero variance -> r_ppm = 0
        edges = [(1, 2), (2, 3), (3, 4), (1, 4)]
        sf = _write_graph(tmp_path / "c", edges)
        r = degree_assortativity(sf).to_pylist()[0]
        assert r["r_ppm"] == 0
        assert r["n_edges"] == 4

    def test_matches_naive_on_real_data(self):
        from ocr_engine_ray.pipelines.basket import copurchase_edges

        edges = [
            (r["p1"], r["p2"]) for r in copurchase_edges(SF, min_support=2).take_all()
        ]
        got = degree_assortativity(SF).to_pylist()[0]
        m, sx, sxx, sxy, r_ppm = _naive_r(edges)
        assert (got["m_stubs"], got["sx"], got["sxx"], got["sxy"], got["r_ppm"]) == (
            m, sx, sxx, sxy, r_ppm,
        )
