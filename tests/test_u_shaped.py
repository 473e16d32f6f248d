"""U-shaped (position-based) attribution."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import u_shaped_attribution

T0 = dt.datetime(2024, 2, 1)


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
class TestUShapedAttribution:
    def test_40_20_40_with_remainder(self, tmp_path):
        # k=5: first 400000, last 400000, middles 200000//3 = 66666 each,
        # remainder 2 to the latest middle (click 4)
        rows = [(i, T0 + dt.timedelta(minutes=i), 1, "click") for i in range(1, 6)]
        rows.append((9, T0 + dt.timedelta(hours=1), 1, "purchase"))
        sf = _write_events(tmp_path / "u", rows)
        got = {r["click_event_id"]: r["credit_ppm_total"]
               for r in u_shaped_attribution(sf).take_all()}
        assert got[1] == 400_000
        assert got[5] == 400_000
        assert got[2] == 66_666 and got[3] == 66_666
        assert got[4] == 66_666 + 2
        assert sum(got.values()) == 1_000_000

    def test_small_k_cases(self, tmp_path):
        rows = [
            (1, T0, 1, "click"), (2, T0 + dt.timedelta(hours=1), 1, "purchase"),
            (3, T0, 2, "click"), (4, T0 + dt.timedelta(minutes=1), 2, "click"),
            (5, T0 + dt.timedelta(hours=1), 2, "purchase"),
        ]
        sf = _write_events(tmp_path / "k", rows)
        got = {r["click_event_id"]: r["credit_ppm_total"]
               for r in u_shaped_attribution(sf).take_all()}
        assert got[1] == 1_000_000            # k=1
        assert got[3] == got[4] == 500_000    # k=2
