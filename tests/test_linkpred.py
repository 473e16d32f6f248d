"""common_neighbors_topk / event_trigrams / herfindahl_by_nation unit tests."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import event_trigrams
from ocr_engine_ray.pipelines.basket import common_neighbors_topk
from ocr_engine_ray.pipelines.profile import herfindahl_by_nation

T0 = dt.datetime(2024, 1, 1)


def _write_lineitem_orders(d, rows):
    """rows: [(okey, partkey)] — one lineitem row per entry."""
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestCommonNeighbors:
    def test_open_wedge_found(self, tmp_path):
        # edges (1,2) and (1,3), each supported by two orders; (2,3) never
        # co-bought -> the one predicted link, via center 1.
        rows = [
            (1, 1), (1, 2),
            (2, 1), (2, 2),
            (3, 1), (3, 3),
            (4, 1), (4, 3),
        ]
        sf = _write_lineitem_orders(tmp_path / "w", rows)
        got = common_neighbors_topk(sf).take_all()
        assert len(got) == 1
        assert (got[0]["p1"], got[0]["p2"], got[0]["cn"]) == (2, 3, 1)

    def test_closed_triangle_excluded(self, tmp_path):
        # all three edges exist -> no non-adjacent pair survives.
        rows = []
        for okey, (a, b) in enumerate([(1, 2), (1, 3), (2, 3)] * 2, start=1):
            rows += [(okey, a), (okey, b)]
        sf = _write_lineitem_orders(tmp_path / "t", rows)
        assert common_neighbors_topk(sf).count() == 0

    def test_hub_cap_excludes_center(self, tmp_path):
        rows = [
            (1, 1), (1, 2),
            (2, 1), (2, 2),
            (3, 1), (3, 3),
            (4, 1), (4, 3),
        ]
        sf = _write_lineitem_orders(tmp_path / "h", rows)
        # center 1 has degree 2 > max_degree=1 -> excluded, no wedges.
        assert common_neighbors_topk(sf, max_degree=1).count() == 0

    def test_cn_counts_multiple_centers(self, tmp_path):
        # (2,3) share centers 1 and 4 -> cn = 2.
        rows = []
        okey = 0
        for ctr in (1, 4):
            for nbr in (2, 3):
                for _ in range(2):  # support 2 per edge
                    okey += 1
                    rows += [(okey, ctr), (okey, nbr)]
        sf = _write_lineitem_orders(tmp_path / "m", rows)
        got = {(r["p1"], r["p2"]): r["cn"] for r in common_neighbors_topk(sf).take_all()}
        assert got[(2, 3)] == 2


def _write_events(d, rows):
    """rows: [(event_id, user_id, ts, event_type)]."""
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestEventTrigrams:
    def test_hand_computed(self, tmp_path):
        rows = [
            (i, 1, T0 + dt.timedelta(minutes=i), t)
            for i, t in enumerate(["a", "b", "c", "b"])
        ]
        sf = _write_events(tmp_path / "e", rows)
        got = {(r["t1"], r["t2"], r["t3"]): r for r in event_trigrams(sf).to_pylist()}
        assert got[("a", "b", "c")]["n"] == 1
        assert got[("b", "c", "b")]["n"] == 1
        assert got[("a", "b", "c")]["p_ppm"] == 500_000
        assert len(got) == 2

    def test_users_partition(self, tmp_path):
        # 2 events per user -> no trigram crosses users.
        rows = [
            (1, 1, T0, "a"), (2, 1, T0 + dt.timedelta(minutes=1), "b"),
            (3, 2, T0 + dt.timedelta(minutes=2), "c"),
            (4, 2, T0 + dt.timedelta(minutes=3), "d"),
        ]
        sf = _write_events(tmp_path / "p", rows)
        assert event_trigrams(sf).num_rows == 0

    def test_equal_ts_breaks_by_event_id(self, tmp_path):
        rows = [(1, 1, T0, "x"), (2, 1, T0, "y"), (3, 1, T0, "z")]
        sf = _write_events(tmp_path / "q", rows)
        got = event_trigrams(sf).to_pylist()
        assert len(got) == 1
        assert (got[0]["t1"], got[0]["t2"], got[0]["t3"]) == ("x", "y", "z")


def _write_supplier_tables(d, li_rows, suppliers, nations):
    """li_rows: [(suppkey, price)]; suppliers: {suppkey: nationkey};
    nations: {nationkey: name}."""
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "l_suppkey": pa.array([r[0] for r in li_rows], pa.int64()),
                "l_extendedprice": pa.array([r[1] for r in li_rows], pa.float64()),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    sk = sorted(suppliers)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(sk, pa.int64()),
                "s_nationkey": pa.array([suppliers[k] for k in sk], pa.int64()),
            }
        ),
        str(d / "supplier.parquet"),
    )
    nk = sorted(nations)
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(nk, pa.int64()),
                "n_name": pa.array([nations[k] for k in nk], pa.string()),
            }
        ),
        str(d / "nation.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestHerfindahl:
    def test_hand_computed(self, tmp_path):
        # shares 30/40 and 10/40 -> HHI = 0.5625 + 0.0625 = 0.625
        sf = _write_supplier_tables(
            tmp_path / "a",
            [(1, 0.30), (2, 0.10)],
            {1: 7, 2: 7},
            {7: "ALPHA"},
        )
        got = herfindahl_by_nation(sf).take_all()[0]
        assert got["n_name"] == "ALPHA"
        assert got["n_suppliers"] == 2
        assert got["sum_cents"] == 40
        assert got["hhi_ppm"] == 625_000

    def test_monopoly_is_one(self, tmp_path):
        sf = _write_supplier_tables(
            tmp_path / "m", [(1, 5.0)], {1: 3}, {3: "MONO"}
        )
        got = herfindahl_by_nation(sf).take_all()[0]
        assert got["hhi_ppm"] == 1_000_000

    def test_cents_square_exceeds_int64(self, tmp_path):
        # per-supplier cents ~3.05e9: the SQUARE overflows int64 — two
        # equal suppliers must read exactly 500000 ppm, not garbage.
        big = 3.05e7  # dollars -> 3.05e9 cents
        sf = _write_supplier_tables(
            tmp_path / "b",
            [(1, big), (2, big)],
            {1: 1, 2: 1},
            {1: "BIG"},
        )
        got = herfindahl_by_nation(sf).take_all()[0]
        assert got["hhi_ppm"] == 500_000


@pytest.mark.usefixtures("ray_session")
class TestResourceAllocation:
    def test_hub_discount(self, tmp_path):
        from ocr_engine_ray.pipelines.basket import resource_allocation_topk

        # center 1 (degree 2) connects (2,3); center 10 (degree 4)
        # connects (11,12), (11,13), (12,13), ...
        rows = []
        okey = 0
        for ctr, nbrs in [(1, [2, 3]), (10, [11, 12, 13, 14])]:
            for nbr in nbrs:
                for _ in range(2):
                    okey += 1
                    rows += [(okey, ctr), (okey, nbr)]
        sf = _write_lineitem_orders(tmp_path / "ra", rows)
        got = {
            (r["p1"], r["p2"]): r
            for r in resource_allocation_topk(sf).take_all()
        }
        # through the degree-2 center: 1e9 // 2
        assert got[(2, 3)]["ra_score"] == 500_000_000
        assert got[(2, 3)]["cn"] == 1
        # through the degree-4 hub: 1e9 // 4 — discounted
        assert got[(11, 12)]["ra_score"] == 250_000_000
        assert got[(2, 3)]["ra_score"] > got[(11, 12)]["ra_score"]


@pytest.mark.usefixtures("ray_session")
class TestLinkpredHoldout:
    def test_counts_and_split_disjoint(self, tmp_path):
        from ocr_engine_ray.pipelines.basket import linkpred_holdout_eval

        rows = []
        okey = 0
        for ctr in range(1, 9):
            for nbr in (100, 101, 102):
                for _ in range(2):
                    okey += 1
                    rows += [(okey, ctr), (okey, nbr)]
        sf = _write_lineitem_orders(tmp_path / "lp", rows)
        got = linkpred_holdout_eval(sf).take_all()[0]
        # every edge lands in exactly one split
        assert got["n_train_edges"] + got["n_test_edges"] > 0
        assert 0 <= got["n_hits"] <= got["k"]
        assert got["hit_ppm"] == got["n_hits"] * 1_000_000 // max(got["k"], 1)

    def test_hits_found_when_test_edge_predictable(self, tmp_path):
        from ocr_engine_ray.pipelines.basket import linkpred_holdout_eval

        # a 10-clique: hiding any edge (a, b) leaves 8 common neighbors,
        # so hidden edges top the prediction list (bipartite graphs would
        # NOT work here — a cross-side edge has zero common neighbors).
        import itertools

        rows = []
        okey = 0
        for a, b in itertools.combinations(range(1, 11), 2):
            for _ in range(2):
                okey += 1
                rows += [(okey, a), (okey, b)]
        sf = _write_lineitem_orders(tmp_path / "hp", rows)
        got = linkpred_holdout_eval(sf).take_all()[0]
        assert got["n_test_edges"] > 0
        # every hidden clique edge is among the top-50 predictions
        assert got["n_hits"] == got["n_test_edges"]


@pytest.mark.usefixtures("ray_session")
class TestSessionPaths:
    def test_gap_splits_paths(self, tmp_path):
        from ocr_engine_ray.pipelines.analytics import session_paths_topk

        rows = [
            (1, 1, T0, "a"),
            (2, 1, T0 + dt.timedelta(minutes=5), "b"),
            # > 30 min gap -> new session
            (3, 1, T0 + dt.timedelta(minutes=60), "a"),
            (4, 1, T0 + dt.timedelta(minutes=65), "b"),
            (5, 2, T0, "c"),
        ]
        sf = _write_events(tmp_path / "sp", rows)
        got = {r["path"]: r["n"] for r in session_paths_topk(sf).take_all()}
        assert got == {"a>b": 2, "c": 1}

    def test_topk_order_and_tiebreak(self, tmp_path):
        from ocr_engine_ray.pipelines.analytics import session_paths_topk

        rows = []
        eid = 0
        for u, types in [(1, "xy"), (2, "xy"), (3, "ab"), (4, "cd")]:
            for i, t in enumerate(types):
                eid += 1
                rows.append((eid, u, T0 + dt.timedelta(minutes=i), t))
        sf = _write_events(tmp_path / "tk", rows)
        got = session_paths_topk(sf, k=2).take_all()
        assert [(r["path"], r["n"]) for r in got] == [("x>y", 2), ("a>b", 1)]
