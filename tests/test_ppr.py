"""Personalized PageRank recommendations in exact fixed-point."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import ppr_rows
from ocr_engine_ray.pipelines.pagerank import ppr_digest, ppr_recommendations

SF_GATE = "/root/testdata/sf0.01"


def _computed(sf: str) -> tuple[int, int]:
    """Round-5: the twin is COMPUTED SQL (the unrolled exact-integer walk
    in `_ppr_sql`), not a pinned literal — run it."""
    import duckdb

    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS"
        f" SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
    )
    return con.execute(e.oracle_sql()["ppr_digest"]).fetchone()


def test_computed_twin_matches_oracle():
    # two scales: proves the twin genuinely recomputes
    assert _computed(SF_GATE) == ppr_rows(SF_GATE)
    assert _computed("/root/testdata/sf0.001") == ppr_rows(
        "/root/testdata/sf0.001"
    )


def _write_graph(d, edges):
    ok, pk = [], []
    o = 100
    for a, b in edges:
        for _ in range(2):
            ok.extend([o, o])
            pk.extend([a, b])
            o += 1
    d.mkdir(parents=True)
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
class TestPPR:
    def test_neighbors_rank_above_distant_nodes(self, tmp_path):
        # star around 1 with a 2-hop tail off node 2: from seed 1 the
        # direct neighbors carry most of the restart mass; the tail
        # decays with distance
        edges = [(1, 2), (1, 3), (1, 4), (2, 5), (5, 6)]
        sf = _write_graph(tmp_path / "s", edges)
        t = ppr_recommendations(sf, num_seeds=1)
        rows = [r for r in t.to_pylist() if r["seed"] == 1]
        by_rank = [r["node"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert set(by_rank[:3]) == {2, 3, 4}
        assert by_rank.index(6) > by_rank.index(5)

    def test_engine_matches_sequential_twin(self, tmp_path):
        edges = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 5), (5, 6)]
        sf = _write_graph(tmp_path / "m", edges)
        t = ppr_digest(sf)
        eng = (t.column("n_rows")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == ppr_rows(sf)

    def test_gate_scale_agreement(self):
        sf = "/root/testdata/sf0.001"
        t = ppr_digest(sf)
        eng = (t.column("n_rows")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == ppr_rows(sf)
