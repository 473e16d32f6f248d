"""Exact-integer PageRank over the customer↔supplier trade graph."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.pagerank import PR_BASE, PR_S0, trade_pagerank

SF = "/root/testdata/sf0.001"


def _naive_pagerank(sf_dir: str, iters: int = 5):
    """Independent sequential reference (dict/set graph, Python ints)."""
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).to_pydict()
    od = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pydict()
    o2c = dict(zip(od["o_orderkey"], od["o_custkey"]))
    pairs = {(o2c[k], s) for k, s in zip(li["l_orderkey"], li["l_suppkey"])}
    edges: dict[int, set[int]] = {}
    for c, s in pairs:
        edges.setdefault(2 * c, set()).add(2 * s + 1)
        edges.setdefault(2 * s + 1, set()).add(2 * c)
    score = {n: PR_S0 for n in edges}
    for _ in range(iters):
        acc = {n: 0 for n in edges}
        for u, outs in edges.items():
            cu = score[u] // len(outs)
            for v in outs:
                acc[v] += cu
        score = {n: PR_BASE + (17 * a) // 20 for n, a in acc.items()}
    return sorted(
        (("customer" if n % 2 == 0 else "supplier"), n // 2, s)
        for n, s in score.items()
    )


@pytest.mark.usefixtures("ray_session")
class TestTradePagerank:
    def test_matches_naive_reference(self):
        want = _naive_pagerank(SF)
        got = [
            (r["kind"], r["node_key"], r["score"])
            for r in trade_pagerank(SF).take_all()
        ]
        assert got == want

    def test_bucket_invariance(self):
        a = [tuple(r.values()) for r in trade_pagerank(SF, num_buckets=5).take_all()]
        b = [tuple(r.values()) for r in trade_pagerank(SF, num_buckets=32).take_all()]
        assert a == b

    def test_single_round(self):
        # one round: every node's score is BASE + 17/20 of the split mass
        want = _naive_pagerank(SF, iters=1)
        got = [
            (r["kind"], r["node_key"], r["score"])
            for r in trade_pagerank(SF, iters=1).take_all()
        ]
        assert got == want

    def test_mass_nearly_conserved(self):
        # floor division only ever loses mass; damping replaces it with BASE
        rows = trade_pagerank(SF).take_all()
        n = len(rows)
        total = sum(r["score"] for r in rows)
        assert total <= n * PR_S0
        assert total >= int(n * PR_S0 * 0.99)  # floors lose < 1%
