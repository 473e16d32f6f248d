"""KS-style value drift audit."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import value_drift_audit

T0 = dt.datetime(2024, 1, 1)


def _write_events(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(list(range(len(rows))), pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestValueDrift:
    def test_step_change_detected(self, tmp_path):
        # 4 days at 1.00 then 4 days at 100.00: the drift day is day 4
        # (running total furthest below the uniform line just before the
        # step's mass arrives)
        rows = [(T0 + dt.timedelta(days=i), "click", 1.0) for i in range(4)]
        rows += [(T0 + dt.timedelta(days=4 + i), "click", 100.0) for i in range(4)]
        sf = _write_events(tmp_path / "s", rows)
        got = value_drift_audit(sf).take_all()[0]
        assert got["n_days"] == 8
        assert got["total_cents"] == 4 * 100 + 4 * 10000
        assert got["drift_day"] == T0 + dt.timedelta(days=3)
        # D_4 = |8·400 − 4·40400| = 158400
        assert got["max_dev"] == str(abs(8 * 400 - 4 * 40400))

    def test_uniform_stream_small_dev(self, tmp_path):
        rows = [(T0 + dt.timedelta(days=i), "view", 5.0) for i in range(10)]
        sf = _write_events(tmp_path / "u", rows)
        got = value_drift_audit(sf).take_all()[0]
        assert got["max_dev"] == "0"  # perfectly uniform accrual
