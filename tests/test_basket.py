"""Market-basket co-occurrence pair mining."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import datetime as dt

from ocr_engine_ray.pipelines import basket
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


class TestTriangles:
    def _write(self, tmp_path, baskets):
        """baskets: list of part lists; each written twice so every pair
        reaches the min_support=2 edge threshold."""
        rows = []
        i = 0
        for rep in range(2):
            for o, parts in enumerate(baskets):
                for p in parts:
                    rows.append(
                        {"l_orderkey": o + rep * 1000, "l_partkey": p,
                         "l_suppkey": 1, "l_linenumber": i % 7,
                         "l_quantity": 1.0, "l_extendedprice": 1.0,
                         "l_discount": 0.0, "l_tax": 0.0,
                         "l_returnflag": "N", "l_linestatus": "O",
                         "l_shipdate": dt.datetime(2020, 1, 1)}
                    )
                    i += 1
        d = tmp_path / "tri"
        d.mkdir(parents=True)
        pq.write_table(pa.Table.from_pylist(rows), str(d / "lineitem.parquet"))
        return str(d)

    def test_planted_triangles(self, ray_session, tmp_path):
        # K4 on {1,2,3,4} -> 6 edges, C(4,3)=4 triangles; ORIENTED wedges
        # (higher-neighbor pairs of each low vertex) = C(3,2)+C(2,2) = 4,
        # all closed.  The pendant path 5-6, 6-7 adds no oriented wedge
        # (no vertex has two higher neighbors).
        sf = self._write(tmp_path, [[1, 2, 3, 4], [5, 6], [6, 7]])
        t = basket.triangle_count(sf)
        assert t.to_pydict() == {
            "n_edges": [8], "n_wedges": [4], "n_triangles": [4]
        }
        # a genuinely open oriented wedge: low vertex with two higher
        # neighbors that aren't connected
        sf2 = self._write(tmp_path / "w2", [[10, 20], [10, 30]])
        t2 = basket.triangle_count(sf2)
        assert t2.to_pydict() == {
            "n_edges": [2], "n_wedges": [1], "n_triangles": [0]
        }

    def test_matches_twin_and_buckets(self, ray_session, tmp_path):
        import duckdb

        import __ray_entry__ as entry

        sf = self._write(
            tmp_path, [[1, 2, 3], [2, 3, 4], [3, 4, 5], [1, 5], [2, 5]]
        )
        got = basket.triangle_count(sf)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
        )
        want = con.execute(entry.oracle_sql()["triangle_count"]).fetchone()
        assert (
            got.column("n_edges")[0].as_py(),
            got.column("n_wedges")[0].as_py(),
            got.column("n_triangles")[0].as_py(),
        ) == tuple(want)
        a = basket.triangle_count(sf, num_buckets=3)
        assert a.equals(got)

    def test_support_threshold_drops_weak_edges(self, ray_session, tmp_path):
        # min_support=5 removes every edge (each pair occurs exactly twice)
        sf = self._write(tmp_path, [[1, 2, 3]])
        t = basket.triangle_count(sf, min_support=5)
        assert t.to_pydict() == {
            "n_edges": [0], "n_wedges": [0], "n_triangles": [0]
        }
