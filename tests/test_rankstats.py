"""rankstats unit tests: Mann-Whitney U / Spearman / lag-k ACF / RFM grid."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.rankstats import (
    acf_daily_revenue,
    mannwhitney_order_value,
    rfm_segments,
    spearman_qty_price,
)

T0 = dt.datetime(2024, 1, 1)


def _write_orders_customers(d, orders, segs):
    """orders: [(okey, custkey, totalprice, date)]; segs: {custkey: seg}."""
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
                "o_totalprice": pa.array([o[2] for o in orders], pa.float64()),
                "o_orderdate": pa.array(
                    [o[3] for o in orders], pa.timestamp("us")
                ),
            }
        ),
        str(d / "orders.parquet"),
    )
    keys = sorted(segs)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(keys, pa.int64()),
                "c_mktsegment": pa.array([segs[k] for k in keys], pa.string()),
            }
        ),
        str(d / "customer.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestMannWhitney:
    def test_hand_computed(self, tmp_path):
        # BUILDING values 10, 30; MACHINERY values 20, 40
        # combined ranks (cents asc): 10->1, 20->2, 30->3, 40->4
        # R_a = 1 + 3 = 4; U_a = 4 - 2*3/2 = 1; U_b = 4 - 1 = 3
        orders = [
            (1, 1, 10.0, T0),
            (2, 1, 30.0, T0),
            (3, 2, 20.0, T0),
            (4, 2, 40.0, T0),
        ]
        sf = _write_orders_customers(
            tmp_path / "a", orders, {1: "BUILDING", 2: "MACHINERY"}
        )
        got = mannwhitney_order_value(sf).take_all()[0]
        assert (got["n_a"], got["n_b"]) == (2, 2)
        assert got["rank_sum_a"] == "4"
        assert (got["u_a"], got["u_b"]) == ("1", "3")
        z = (1.0 - 4.0 / 2.0) / np.sqrt((2 * 2 * 5) / 12.0)
        assert got["z_milli"] == int(np.round(z * 1000))

    def test_tie_breaks_by_orderkey(self, tmp_path):
        # equal cents: rank order pinned by o_orderkey — okey 1 (BUILDING)
        # before okey 2 (MACHINERY), so R_a = 1 not 2.
        orders = [(1, 1, 50.0, T0), (2, 2, 50.0, T0)]
        sf = _write_orders_customers(
            tmp_path / "t", orders, {1: "BUILDING", 2: "MACHINERY"}
        )
        got = mannwhitney_order_value(sf).take_all()[0]
        assert got["rank_sum_a"] == "1"
        assert (got["u_a"], got["u_b"]) == ("0", "1")

    def test_other_segments_excluded(self, tmp_path):
        orders = [(1, 1, 10.0, T0), (2, 2, 20.0, T0), (3, 3, 99.0, T0)]
        sf = _write_orders_customers(
            tmp_path / "x",
            orders,
            {1: "BUILDING", 2: "MACHINERY", 3: "FURNITURE"},
        )
        got = mannwhitney_order_value(sf).take_all()[0]
        assert (got["n_a"], got["n_b"]) == (1, 1)


def _write_lineitem(d, rows):
    """rows: [(okey, lineno, qty, price)]."""
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_linenumber": pa.array([r[1] for r in rows], pa.int64()),
                "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
                "l_extendedprice": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestSpearman:
    def test_perfect_monotone(self, tmp_path):
        rows = [(i, 1, float(i), float(10 * i)) for i in range(1, 9)]
        sf = _write_lineitem(tmp_path / "m", rows)
        got = spearman_qty_price(sf).take_all()[0]
        assert got["n"] == 8
        assert got["sum_d2"] == "0"
        assert got["rho_ppm"] == 1_000_000

    def test_perfect_inverse(self, tmp_path):
        rows = [(i, 1, float(i), float(100 - 10 * i)) for i in range(1, 9)]
        sf = _write_lineitem(tmp_path / "i", rows)
        got = spearman_qty_price(sf).take_all()[0]
        assert got["rho_ppm"] == -1_000_000

    def test_duplicate_line_ids(self, tmp_path):
        # (okey, lineno) repeats — the synthetic-table shape that requires
        # the uid pass.  uid order (okey, lineno, x, y):
        #   (1,1,100,500)->uid1, (1,1,200,400)->uid2, (2,1,300,600)->uid3
        # rx by (x, uid): 1,2,3 ; ry by (y, uid): 400->1, 500->2, 600->3
        # so ry = 2,1,3 and sum_d2 = 1 + 1 + 0 = 2
        rows = [(1, 1, 1.0, 5.0), (1, 1, 2.0, 4.0), (2, 1, 3.0, 6.0)]
        sf = _write_lineitem(tmp_path / "d", rows)
        got = spearman_qty_price(sf).take_all()[0]
        assert got["n"] == 3
        assert got["sum_d2"] == "2"
        rho = 1 - 6 * 2 / (3 * 8)
        assert got["rho_ppm"] == int(np.round(rho * 1_000_000))

    def test_matches_numpy_on_random(self, tmp_path):
        rng = np.random.RandomState(7)
        n = 200
        rows = [
            (int(rng.randint(1, 40)), int(rng.randint(1, 8)),
             float(rng.randint(1, 20)), float(rng.randint(1, 500)))
            for _ in range(n)
        ]
        sf = _write_lineitem(tmp_path / "r", rows)
        got = spearman_qty_price(sf).take_all()[0]
        okey = np.array([r[0] for r in rows], np.int64)
        lineno = np.array([r[1] for r in rows], np.int64)
        x = np.round(np.array([r[2] for r in rows]) * 100).astype(np.int64)
        y = np.round(np.array([r[3] for r in rows]) * 100).astype(np.int64)
        uid = np.empty(n, np.int64)
        uid[np.lexsort((y, x, lineno, okey))] = np.arange(1, n + 1)
        rx = np.empty(n, np.int64)
        rx[np.lexsort((uid, x))] = np.arange(1, n + 1)
        ry = np.empty(n, np.int64)
        ry[np.lexsort((uid, y))] = np.arange(1, n + 1)
        want = int(((rx - ry) ** 2).sum())
        assert got["sum_d2"] == str(want)


def _write_events(d, rows):
    """rows: [(ts, value)]."""
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[1] for r in rows], pa.float64()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestAcf:
    def test_alternating_series(self, tmp_path):
        # daily revenue 1, 3, 1, 3, 1, 3 — lag-1 ACF = -1, lag-2 ACF = +1
        rows = [
            (T0 + dt.timedelta(days=i), 1.0 if i % 2 == 0 else 3.0)
            for i in range(6)
        ]
        sf = _write_events(tmp_path / "a", rows)
        got = {r["lag"]: r for r in acf_daily_revenue(sf).take_all()}
        assert got[1]["n_pairs"] == 5
        assert got[1]["acf_ppm"] == -1_000_000
        assert got[2]["n_pairs"] == 4
        assert got[2]["acf_ppm"] == 1_000_000
        assert got[7]["n_pairs"] == 0 and got[7]["acf_ppm"] == 0

    def test_gap_days_pair_only_when_both_exist(self, tmp_path):
        # days 0, 1, 3 — lag-1 pairs: (0,1) only; lag-2 pairs: (1,3) only
        rows = [
            (T0, 1.0),
            (T0 + dt.timedelta(days=1), 2.0),
            (T0 + dt.timedelta(days=3), 4.0),
        ]
        sf = _write_events(tmp_path / "g", rows)
        got = {r["lag"]: r for r in acf_daily_revenue(sf).take_all()}
        assert got[1]["n_pairs"] == 1
        assert got[2]["n_pairs"] == 1
        assert got[3]["n_pairs"] == 1  # (0, 3)
        # single-pair correlation is degenerate (zero variance) -> 0
        assert got[1]["acf_ppm"] == 0

    def test_intraday_events_fold_to_daily(self, tmp_path):
        rows = [
            (T0 + dt.timedelta(hours=h), 1.0) for h in range(4)
        ] + [(T0 + dt.timedelta(days=1, hours=2), 8.0)]
        sf = _write_events(tmp_path / "f", rows)
        got = {r["lag"]: r for r in acf_daily_revenue(sf).take_all()}
        assert got[1]["n_pairs"] == 1  # (400 cents, 800 cents)


@pytest.mark.usefixtures("ray_session")
class TestRfm:
    def test_grid_hand_computed(self, tmp_path):
        # 5 customers, one order each on distinct days with distinct
        # totals: every measure ranks them uniquely -> each tile has one
        # customer; frequency ties all at 1 -> f_tile = rank by custkey.
        orders = [
            (i, i, float(10 * i), T0 + dt.timedelta(days=i)) for i in range(1, 6)
        ]
        sf = _write_orders_customers(
            tmp_path / "r", orders, {i: "BUILDING" for i in range(1, 6)}
        )
        rows = rfm_segments(sf).take_all()
        assert sum(r["n_customers"] for r in rows) == 5
        by_m = {r["m_tile"]: r for r in rows}
        # monetary tile t holds customer t (cents ascending)
        for t in range(1, 6):
            assert by_m[t]["sum_cents"] == 1000 * t
            # recency ascending: most recent (cust 5) is tile 1
            assert by_m[t]["r_tile"] == 6 - t
            # frequency all ties -> order by custkey: cust t -> tile t
            assert by_m[t]["f_tile"] == t

    def test_multi_order_customer(self, tmp_path):
        orders = [
            (1, 1, 10.0, T0),
            (2, 1, 10.0, T0 + dt.timedelta(days=3)),
            (3, 2, 50.0, T0 + dt.timedelta(days=1)),
        ]
        sf = _write_orders_customers(
            tmp_path / "m", orders, {1: "BUILDING", 2: "MACHINERY"}
        )
        rows = rfm_segments(sf).take_all()
        assert sum(r["n_customers"] for r in rows) == 2
        # cust 1: freq 2, cents 2000, recency 0; cust 2: freq 1, cents
        # 5000, recency 2 -> cust 1 = (r1, f2, m1), cust 2 = (r2, f1, m2)
        cells = {(r["r_tile"], r["f_tile"], r["m_tile"]) for r in rows}
        assert cells == {(1, 2, 1), (2, 1, 2)}
