"""Last-touch attribution (7-day lookback, strict-before tie rules)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import last_touch_attribution

T0 = dt.datetime(2024, 1, 10, 12, 0, 0)


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
class TestLastTouch:
    def test_rules(self, tmp_path):
        rows = [
            # user 1: click then purchase -> attributed
            (1, T0, 1, "click"),
            (2, T0 + dt.timedelta(hours=1), 1, "purchase"),
            # user 1: second purchase attributes to the SAME last click
            (3, T0 + dt.timedelta(hours=2), 1, "purchase"),
            # user 2: click at the SAME instant as purchase -> NOT attributed
            (4, T0, 2, "click"),
            (5, T0, 2, "purchase"),
            # user 3: click 8 days before purchase -> outside window
            (6, T0 - dt.timedelta(days=8), 3, "click"),
            (7, T0, 3, "purchase"),
            # user 4: two clicks, later one wins; view is ignored
            (8, T0, 4, "click"),
            (9, T0 + dt.timedelta(minutes=30), 4, "click"),
            (10, T0 + dt.timedelta(minutes=45), 4, "view"),
            (11, T0 + dt.timedelta(hours=1), 4, "purchase"),
            # user 5: equal-ts click pair -> max event_id wins
            (12, T0, 5, "click"),
            (13, T0, 5, "click"),
            (14, T0 + dt.timedelta(minutes=1), 5, "purchase"),
            # user 6: purchase with no click at all
            (15, T0, 6, "purchase"),
        ]
        sf = _write_events(tmp_path / "e", rows)
        got = {r["event_id"]: r for r in last_touch_attribution(sf).take_all()}
        assert set(got) == {2, 3, 11, 14}
        assert got[2]["click_event_id"] == 1
        assert got[2]["gap_us"] == 3600 * 1_000_000
        assert got[3]["click_event_id"] == 1
        assert got[11]["click_event_id"] == 9
        assert got[14]["click_event_id"] == 13

    def test_window_boundary_inclusive(self, tmp_path):
        rows = [
            (1, T0 - dt.timedelta(days=7), 1, "click"),  # exactly 7 days
            (2, T0, 1, "purchase"),
            (3, T0 - dt.timedelta(days=7, microseconds=1), 2, "click"),
            (4, T0, 2, "purchase"),
        ]
        sf = _write_events(tmp_path / "w", rows)
        got = {r["event_id"]: r for r in last_touch_attribution(sf).take_all()}
        assert set(got) == {2}  # 7d exactly qualifies; 7d+1µs does not

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = last_touch_attribution(sf, num_buckets=3).to_pandas()
        b = last_touch_attribution(sf, num_buckets=64).to_pandas()
        assert a.equals(b)
