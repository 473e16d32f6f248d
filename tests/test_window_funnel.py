"""ClickHouse-style windowFunnel depth histogram."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import window_funnel_depth

T0 = dt.datetime(2024, 5, 1)


def _write_events(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(list(range(len(rows))), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array([""] * len(rows)),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


def h(x):
    return T0 + dt.timedelta(hours=x)


@pytest.mark.usefixtures("ray_session")
class TestWindowFunnel:
    def test_depths(self, tmp_path):
        rows = [
            # u1: full funnel inside 24h -> depth 3
            (1, h(0), "view"), (1, h(1), "click"), (1, h(2), "purchase"),
            # u2: click only AFTER the 24h window -> depth 1
            (2, h(0), "view"), (2, h(25), "click"),
            # u3: view + click, purchase BEFORE the click (wrong order) -> 2
            (3, h(0), "view"), (3, h(1), "purchase"), (3, h(2), "click"),
            # u4: clicks but never views -> depth 0
            (4, h(0), "click"), (4, h(1), "purchase"),
            # u5: purchase exactly at the inclusive 24h deadline -> 3
            (5, h(0), "view"), (5, h(1), "click"), (5, h(24), "purchase"),
        ]
        sf = _write_events(tmp_path / "f", rows)
        got = {r["depth"]: r["n_users"] for r in window_funnel_depth(sf).take_all()}
        assert got == {0: 1, 1: 1, 2: 1, 3: 2}

    def test_anchor_is_first_view(self, tmp_path):
        # second view would qualify, but the funnel anchors at the FIRST
        # view, whose window misses the click -> depth 1
        rows = [
            (9, h(0), "view"), (9, h(30), "view"), (9, h(31), "click"),
        ]
        sf = _write_events(tmp_path / "a", rows)
        got = {r["depth"]: r["n_users"] for r in window_funnel_depth(sf).take_all()}
        assert got == {1: 1}
