"""HITS hubs & authorities over the bipartite trade graph."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import hits_rows
from ocr_engine_ray.pipelines.pagerank import HITS_SCALE, hits_digest, trade_hits

SF = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


def _computed(sf: str) -> tuple[int, int]:
    """Round-5: the twin is COMPUTED SQL (the unrolled renormalized
    half-rounds in `_hits_sql`), not a pinned literal — run it."""
    import duckdb

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con.execute(e.oracle_sql()["hits_digest"]).fetchone()


def test_computed_twin_matches_oracle():
    # two scales: proves the twin genuinely recomputes
    assert _computed(SF_GATE) == hits_rows(SF_GATE)
    assert _computed(SF) == hits_rows(SF)


def _write_trade(d, pairs):
    """pairs: iterable of (custkey, suppkey) trading pairs."""
    d.mkdir(parents=True)
    pairs = list(pairs)
    ok = list(range(1, len(pairs) + 1))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "o_custkey": pa.array([c for c, _ in pairs], pa.int64()),
            }
        ),
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_suppkey": pa.array([s for _, s in pairs], pa.int64()),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestTradeHits:
    def test_engine_matches_sequential_oracle(self):
        t = hits_digest(SF)
        eng = (t.column("n_nodes")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == hits_rows(SF)

    def test_bucket_invariance(self):
        a = [tuple(r.values()) for r in trade_hits(SF, num_buckets=5).take_all()]
        b = [tuple(r.values()) for r in trade_hits(SF, num_buckets=32).take_all()]
        assert a == b

    def test_star_graph_known_solution(self, tmp_path):
        # customers 1..3 all buy only from supplier 7; customer 1 also
        # buys from supplier 8.  Authority mass concentrates on 7; hub
        # mass on customer 1 (it reaches both authorities).
        sf = _write_trade(tmp_path / "star", [(1, 7), (2, 7), (3, 7), (1, 8)])
        rows = {
            (r["kind"], r["node_key"]): r["score"]
            for r in trade_hits(sf).take_all()
        }
        assert rows[("supplier", 7)] > rows[("supplier", 8)]
        assert rows[("customer", 1)] > rows[("customer", 2)]
        assert rows[("customer", 2)] == rows[("customer", 3)]
        # each side's renormalized mass sums to HITS_SCALE (± half-even
        # quantization per node)
        hub_total = sum(v for (k, _), v in rows.items() if k == "customer")
        auth_total = sum(v for (k, _), v in rows.items() if k == "supplier")
        assert abs(hub_total - HITS_SCALE) <= 3
        assert abs(auth_total - HITS_SCALE) <= 2

    def test_symmetric_pairs_uniform(self, tmp_path):
        # a perfect matching: every hub/authority is equivalent, so all
        # scores on a side are equal
        sf = _write_trade(tmp_path / "m", [(1, 11), (2, 12), (3, 13)])
        rows = {
            (r["kind"], r["node_key"]): r["score"]
            for r in trade_hits(sf).take_all()
        }
        assert len({v for (k, _), v in rows.items() if k == "customer"}) == 1
        assert len({v for (k, _), v in rows.items() if k == "supplier"}) == 1

    def test_duplicate_trades_collapse(self, tmp_path):
        # the same (cust, supp) pair via many orders counts once (distinct
        # edge set), so scores equal the single-order graph's
        sf1 = _write_trade(tmp_path / "a", [(1, 7), (1, 7), (2, 8), (1, 7)])
        sf2 = _write_trade(tmp_path / "b", [(1, 7), (2, 8)])
        r1 = [tuple(r.values()) for r in trade_hits(sf1).take_all()]
        r2 = [tuple(r.values()) for r in trade_hits(sf2).take_all()]
        assert r1 == r2

    def test_synthetic_matches_oracle(self, tmp_path):
        sf = _write_trade(
            tmp_path / "o",
            [(1, 7), (1, 8), (2, 7), (3, 9), (4, 9), (4, 7), (5, 8)],
        )
        t = hits_digest(sf)
        eng = (t.column("n_nodes")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == hits_rows(sf)
