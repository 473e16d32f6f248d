"""Market-basket co-occurrence pair mining."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.basket import copurchase_pairs

SF = "/root/testdata/sf0.001"


def _naive(rows, *, min_support=2, k=50):
    """Self-join convention: every same-order row pair with p1 < p2."""
    orders: dict[int, list[int]] = {}
    for r in rows:
        orders.setdefault(r["l_orderkey"], []).append(r["l_partkey"])
    cnt: Counter = Counter()
    for parts in orders.values():
        for a, b in combinations(sorted(parts), 2):
            if a < b:
                cnt[(a, b)] += 1
    out = sorted(
        ((-n, p1, p2) for (p1, p2), n in cnt.items() if n >= min_support)
    )[:k]
    return [(p1, p2, -nn) for nn, p1, p2 in out]


@pytest.mark.usefixtures("ray_session")
class TestCopurchase:
    def test_matches_naive_reference(self):
        rows = pq.read_table(
            f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ).to_pylist()
        want = _naive(rows)
        got = [(r["p1"], r["p2"], r["n"]) for r in copurchase_pairs(SF).take_all()]
        assert got == want

    def test_bucket_invariance(self):
        a = [tuple(r.values()) for r in copurchase_pairs(SF, num_buckets=5).take_all()]
        b = [tuple(r.values()) for r in copurchase_pairs(SF, num_buckets=64).take_all()]
        assert a == b

    def test_multiplicity_convention(self, tmp_path):
        # part 7 twice + part 9 once in one order → (7,9) weight 2;
        # the duplicate part alone yields no (7,7) pair
        d = tmp_path / "b"
        d.mkdir()
        rows = [
            {"l_orderkey": 1, "l_partkey": 7},
            {"l_orderkey": 1, "l_partkey": 7},
            {"l_orderkey": 1, "l_partkey": 9},
            {"l_orderkey": 2, "l_partkey": 7},
            {"l_orderkey": 2, "l_partkey": 9},
        ]
        pq.write_table(pa.Table.from_pylist(rows), str(d / "lineitem.parquet"))
        got = [
            (r["p1"], r["p2"], r["n"])
            for r in copurchase_pairs(str(d), min_support=1).take_all()
        ]
        assert got == [(7, 9, 3)]
