"""Weekday-deseasonalized daily anomaly detection."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import seasonal_outlier_days


def _write_events(d, day_values, start=dt.datetime(2024, 1, 1)):
    d.mkdir(parents=True)
    ts, vals = [], []
    for i, v in enumerate(day_values):
        ts.append(start + dt.timedelta(days=i, hours=4))
        vals.append(float(v))
    pq.write_table(
        pa.table({"ts": pa.array(ts, pa.timestamp("us")), "value": vals}),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestSeasonalOutliers:
    def test_planted_spike_and_drop(self, tmp_path):
        # 2024-01-01 is a Monday. 8 weeks of flat 10.0 Mondays-only data,
        # then one 100.0 Monday (spike) and one 0.5 Monday (drop).
        vals = []
        days = []
        start = dt.datetime(2024, 1, 1)
        d = tmp_path / "p"
        d.mkdir(parents=True)
        ts, v = [], []
        for wk in range(10):
            ts.append(start + dt.timedelta(weeks=wk, hours=3))
            if wk == 8:
                v.append(100.0)
            elif wk == 9:
                v.append(0.5)
            else:
                v.append(10.0)
        pq.write_table(
            pa.table({"ts": pa.array(ts, pa.timestamp("us")), "value": v}),
            str(d / "events.parquet"),
        )
        got = seasonal_outlier_days(str(d)).to_pylist()
        assert len(got) == 2
        spike, drop = got
        assert spike["direction"] == 1 and spike["cents"] == 10000
        assert drop["direction"] == -1 and drop["cents"] == 50
        # weekday of a Monday under the DuckDB convention (0 = Sunday)
        assert spike["weekday"] == 1
        # ratio: 10000*10*1e6 // (8*1000 + 10000 + 50)
        total = 8 * 1000 + 10000 + 50
        assert spike["ratio_ppm"] == 10000 * 10 * 1_000_000 // total

    def test_flat_series_no_outliers(self, tmp_path):
        sf = _write_events(tmp_path / "f", [5.0] * 28)
        assert seasonal_outlier_days(sf).to_pylist() == []
