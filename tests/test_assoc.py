"""Association-rule mining (confidence/lift on the exact ppm grid)."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.basket import association_rules

SF = "/root/testdata/sf0.001"


def _naive(rows, *, min_support=2, k=100):
    """Distinct-presence (order-set) semantics, exact integer ppm."""
    orders: dict[int, set[int]] = {}
    for r in rows:
        orders.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    n_orders = len(orders)
    item: Counter = Counter()
    pair: Counter = Counter()
    for parts in orders.values():
        for p in parts:
            item[p] += 1
        for a, b in combinations(sorted(parts), 2):
            pair[(a, b)] += 1
    out = []
    for (p1, p2), n in pair.items():
        if n < min_support:
            continue
        for ante, cons in ((p1, p2), (p2, p1)):
            an, cn = item[ante], item[cons]
            conf = n * 1_000_000 // an
            lift = n * n_orders * 1_000_000 // (an * cn)
            out.append((ante, cons, n, an, cn, conf, lift))
    out.sort(key=lambda r: (-r[5], r[0], r[1]))
    return out[:k]


@pytest.mark.usefixtures("ray_session")
class TestAssociationRules:
    def test_matches_naive_reference(self):
        rows = pq.read_table(
            f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ).to_pylist()
        want = _naive(rows)
        got = [tuple(r.values()) for r in association_rules(SF).take_all()]
        assert got == want

    def test_bucket_invariance(self):
        a = [tuple(r.values()) for r in association_rules(SF, num_buckets=5).take_all()]
        b = [tuple(r.values()) for r in association_rules(SF, num_buckets=64).take_all()]
        assert a == b

    def test_set_semantics_and_scores(self, tmp_path):
        # part 7 twice in order 1 counts ONCE (set semantics — unlike
        # copurchase_pairs' row-pair convention); 3 orders total:
        #   o1 {7, 9}, o2 {7, 9}, o3 {7}
        # pair (7,9) n=2; item 7 n=3, item 9 n=2
        #   7→9: conf = 2e6//3 = 666666, lift = 2*3e6//(3*2) = 1000000
        #   9→7: conf = 2e6//2 = 1000000, lift = 1000000
        d = tmp_path / "a"
        d.mkdir()
        rows = [
            {"l_orderkey": 1, "l_partkey": 7},
            {"l_orderkey": 1, "l_partkey": 7},
            {"l_orderkey": 1, "l_partkey": 9},
            {"l_orderkey": 2, "l_partkey": 7},
            {"l_orderkey": 2, "l_partkey": 9},
            {"l_orderkey": 3, "l_partkey": 7},
        ]
        pq.write_table(pa.Table.from_pylist(rows), str(d / "lineitem.parquet"))
        got = [tuple(r.values()) for r in association_rules(str(d)).take_all()]
        assert got == [
            (9, 7, 2, 2, 3, 1_000_000, 1_000_000),
            (7, 9, 2, 3, 2, 666_666, 1_000_000),
        ]

    def test_matches_twin_on_planted(self, tmp_path):
        import duckdb

        import __ray_entry__ as entry

        d = tmp_path / "t"
        d.mkdir()
        rows = []
        for o in range(40):
            for p in [o % 5, (o * 3) % 7 + 5, (o * o) % 4]:
                rows.append({"l_orderkey": o, "l_partkey": p})
        pq.write_table(pa.Table.from_pylist(rows), str(d / "lineitem.parquet"))
        got = association_rules(str(d)).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
        )
        want = con.execute(entry.oracle_sql()["association_rules"]).df()
        assert got.equals(want)

    def test_min_support(self, tmp_path):
        d = tmp_path / "m"
        d.mkdir()
        rows = [
            {"l_orderkey": 1, "l_partkey": 1},
            {"l_orderkey": 1, "l_partkey": 2},
        ]
        pq.write_table(pa.Table.from_pylist(rows), str(d / "lineitem.parquet"))
        assert association_rules(str(d)).count() == 0  # single co-occurrence
        assert association_rules(str(d), min_support=1).count() == 2
