"""Time-decay multi-touch attribution with exact dyadic day weights."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import time_decay_attribution

T0 = dt.datetime(2024, 2, 10)


def _write_events(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array([""] * len(rows)),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestTimeDecay:
    def test_dyadic_weights_and_conservation(self, tmp_path):
        # clicks 0, 1 and 2 whole days before the purchase:
        # weights 64, 32, 16 -> sum 112
        rows = [
            (1, T0 - dt.timedelta(days=2, hours=1), 7, "click"),
            (2, T0 - dt.timedelta(days=1, hours=1), 7, "click"),
            (3, T0 - dt.timedelta(hours=1), 7, "click"),
            (4, T0, 7, "purchase"),
        ]
        sf = _write_events(tmp_path / "d", rows)
        got = {r["click_event_id"]: r for r in time_decay_attribution(sf).take_all()}
        w = {1: 16, 2: 32, 3: 64}
        base = {k: 1_000_000 * v // 112 for k, v in w.items()}
        rem = 1_000_000 - sum(base.values())
        assert got[1]["credit_ppm_total"] == base[1]
        assert got[2]["credit_ppm_total"] == base[2]
        assert got[3]["credit_ppm_total"] == base[3] + rem
        assert sum(r["credit_ppm_total"] for r in got.values()) == 1_000_000
        # recency must strictly dominate
        assert got[3]["credit_ppm_total"] > got[2]["credit_ppm_total"] > got[1]["credit_ppm_total"]

    def test_boundary_click_clamps_to_oldest_weight(self, tmp_path):
        # exactly-7-day-old click is included with weight 1 (clamped)
        rows = [
            (1, T0 - dt.timedelta(days=7), 3, "click"),
            (2, T0 - dt.timedelta(hours=2), 3, "click"),
            (3, T0, 3, "purchase"),
        ]
        sf = _write_events(tmp_path / "b", rows)
        got = {r["click_event_id"]: r for r in time_decay_attribution(sf).take_all()}
        assert set(got) == {1, 2}
        base1 = 1_000_000 * 1 // 65
        base2 = 1_000_000 * 64 // 65
        assert got[1]["credit_ppm_total"] == base1
        assert got[2]["credit_ppm_total"] == base2 + (1_000_000 - base1 - base2)

    def test_outside_window_excluded(self, tmp_path):
        rows = [
            (1, T0 - dt.timedelta(days=8), 5, "click"),
            (2, T0 + dt.timedelta(minutes=1), 5, "click"),  # after: excluded
            (3, T0, 5, "purchase"),
        ]
        sf = _write_events(tmp_path / "o", rows)
        assert time_decay_attribution(sf).take_all() == []
