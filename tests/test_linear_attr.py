"""Linear multi-touch attribution."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import linear_attribution

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
class TestLinearAttribution:
    def test_equal_split_with_remainder(self, tmp_path):
        rows = [
            (1, T0, 1, "click"),
            (2, T0 + dt.timedelta(minutes=1), 1, "click"),
            (3, T0 + dt.timedelta(minutes=2), 1, "click"),
            (4, T0 + dt.timedelta(hours=1), 1, "purchase"),  # 3-way split
            (5, T0 + dt.timedelta(hours=2), 1, "purchase"),  # same 3 clicks
        ]
        sf = _write_events(tmp_path / "l", rows)
        got = {r["click_event_id"]: r for r in linear_attribution(sf).take_all()}
        # 1e6 // 3 = 333333, remainder 1 to the most recent (click 3)
        assert got[1]["credit_ppm_total"] == 2 * 333_333
        assert got[2]["credit_ppm_total"] == 2 * 333_333
        assert got[3]["credit_ppm_total"] == 2 * 333_334
        assert all(r["n_purchases"] == 2 for r in got.values())
        # conservation: every purchase distributed exactly 1e6
        assert sum(r["credit_ppm_total"] for r in got.values()) == 2 * 1_000_000

    def test_window_and_strictness(self, tmp_path):
        rows = [
            (1, T0 - dt.timedelta(days=8), 1, "click"),  # too old
            (2, T0, 1, "click"),                          # equal ts -> excluded
            (3, T0, 1, "purchase"),
            (4, T0 - dt.timedelta(days=2), 2, "click"),
            (5, T0, 2, "purchase"),
        ]
        sf = _write_events(tmp_path / "w", rows)
        got = {r["click_event_id"]: r for r in linear_attribution(sf).take_all()}
        assert set(got) == {4}
        assert got[4]["credit_ppm_total"] == 1_000_000

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = linear_attribution(sf, num_buckets=3).to_pandas()
        b = linear_attribution(sf, num_buckets=64).to_pandas()
        assert a.equals(b)
