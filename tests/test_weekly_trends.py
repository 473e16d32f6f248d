"""Week-over-week trend deltas."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import weekly_trends


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


MON = dt.datetime(2024, 1, 1)  # a Monday


@pytest.mark.usefixtures("ray_session")
class TestWeeklyTrends:
    def test_deltas_and_first_week_drop(self, tmp_path):
        rows = [
            (MON, "click", 1.0),
            (MON + dt.timedelta(days=2), "click", 2.0),   # same week
            (MON + dt.timedelta(days=7), "click", 10.0),  # next week
            (MON + dt.timedelta(days=21), "click", 5.0),  # gap week skipped
            (MON, "view", 1.0),                            # single week -> dropped
        ]
        sf = _write_events(tmp_path / "w", rows)
        got = [tuple(r.values()) for r in weekly_trends(sf).take_all()]
        # click week2: n=1 (Δ −1), cents 1000 (Δ +700); week4 vs week2: Δ 0 / −500
        assert got == [
            ("click", MON + dt.timedelta(days=7), 1, 1000, -1, 700),
            ("click", MON + dt.timedelta(days=21), 1, 500, 0, -500),
        ]

    def test_sunday_belongs_to_prior_monday_week(self, tmp_path):
        rows = [
            (MON + dt.timedelta(days=6, hours=23), "click", 1.0),  # Sunday night
            (MON + dt.timedelta(days=7), "click", 2.0),  # next Monday
        ]
        sf = _write_events(tmp_path / "s", rows)
        got = weekly_trends(sf).take_all()
        assert len(got) == 1
        assert got[0]["week"] == MON + dt.timedelta(days=7)
        assert got[0]["delta_n"] == 0
