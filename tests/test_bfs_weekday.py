"""bfs_hops / weekday_seasonality unit tests."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import weekday_seasonality
from ocr_engine_ray.pipelines.graph import bfs_hops

T0 = dt.datetime(2024, 1, 1)  # a Monday


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


def _chain_rows(edges):
    """Each (a, b) edge supported by two orders."""
    rows, okey = [], 0
    for a, b in edges:
        for _ in range(2):
            okey += 1
            rows += [(okey, a), (okey, b)]
    return rows


@pytest.mark.usefixtures("ray_session")
class TestBfsHops:
    def test_path_graph(self, tmp_path):
        # path 1-2-3-4; hub = node 2 or 3 (degree 2 each) -> seed = 2.
        # hops from 2: {2:0, 1:1, 3:1, 4:2}
        sf = _write_lineitem_orders(
            tmp_path / "p", _chain_rows([(1, 2), (2, 3), (3, 4)])
        )
        got = {r["hop"]: r["n_parts"] for r in bfs_hops(sf).take_all()}
        assert got == {0: 1, 1: 2, 2: 1}

    def test_disconnected_component_absent(self, tmp_path):
        # star at 1 (degree 2, the seed) + far edge (8, 9)
        sf = _write_lineitem_orders(
            tmp_path / "d", _chain_rows([(1, 2), (1, 3), (8, 9)])
        )
        got = {r["hop"]: r["n_parts"] for r in bfs_hops(sf).take_all()}
        assert got == {0: 1, 1: 2}  # nodes 8, 9 unreached, absent

    def test_seed_tie_breaks_smallest_id(self, tmp_path):
        # two disjoint edges: all degrees 1, seed = smallest id = 1.
        sf = _write_lineitem_orders(tmp_path / "t", _chain_rows([(1, 2), (3, 4)]))
        rows = bfs_hops(sf).take_all()
        assert {r["hop"]: r["n_parts"] for r in rows} == {0: 1, 1: 1}

    def test_raises_past_max_rounds(self, tmp_path):
        # a 4-hop path with max_rounds=2 cannot converge -> loud raise.
        sf = _write_lineitem_orders(
            tmp_path / "r",
            _chain_rows([(1, 2), (1, 3), (3, 4), (4, 5), (5, 6), (6, 7)]),
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            bfs_hops(sf, max_rounds=2)


def _write_events(d, rows):
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
class TestWeekdaySeasonality:
    def test_hand_computed(self, tmp_path):
        # Mon 1.00, Tue 3.00 over one week: mean_all = 200 cents
        rows = [(T0, 1.0), (T0 + dt.timedelta(days=1), 3.0)]
        sf = _write_events(tmp_path / "w", rows)
        got = {r["isodow"]: r for r in weekday_seasonality(sf).take_all()}
        assert set(got) == {1, 2}
        assert got[1]["cents"] == 100 and got[2]["cents"] == 300
        # idx = (100 * 2 * 1e6) // (1 * 400) = 500000 ; Tue 1500000
        assert got[1]["idx_ppm"] == 500_000
        assert got[2]["idx_ppm"] == 1_500_000

    def test_multiple_weeks_average(self, tmp_path):
        # Mondays 1.00 and 3.00 (mean 200), Tuesday 2.00 (mean 200)
        rows = [
            (T0, 1.0),
            (T0 + dt.timedelta(days=7), 3.0),
            (T0 + dt.timedelta(days=1), 2.0),
        ]
        sf = _write_events(tmp_path / "m", rows)
        got = {r["isodow"]: r for r in weekday_seasonality(sf).take_all()}
        assert got[1]["n_days"] == 2
        assert got[1]["idx_ppm"] == 1_000_000
        assert got[2]["idx_ppm"] == 1_000_000

    def test_intraday_folds_before_weekday(self, tmp_path):
        rows = [(T0 + dt.timedelta(hours=h), 1.0) for h in range(3)]
        sf = _write_events(tmp_path / "i", rows)
        got = weekday_seasonality(sf).take_all()
        assert len(got) == 1
        assert got[0]["cents"] == 300
        assert got[0]["idx_ppm"] == 1_000_000
