"""CUSUM changepoint on the exact daily-cents grid."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.rankstats import cusum_changepoint


def _write_events(d, day_values):
    d.mkdir(parents=True)
    ts, vals = [], []
    for i, v in enumerate(day_values):
        ts.append(dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=3))
        vals.append(float(v))
    pq.write_table(
        pa.table({"ts": pa.array(ts, pa.timestamp("us")), "value": vals}),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestCusum:
    def test_obvious_level_shift(self, tmp_path):
        # 10 days at 1.00 then 10 days at 5.00 -> changepoint at k=10
        sf = _write_events(tmp_path / "s", [1.0] * 10 + [5.0] * 10)
        r = cusum_changepoint(sf).take_all()[0]
        assert r["k_index"] == 10
        assert r["n_days"] == 20
        assert r["cp_day"] == dt.datetime(2024, 1, 10)
        # D_10 = 20*1000 - 10*6000 = -40000 -> |.| = 40000 (cents grid)
        assert r["dmax"] == 40000

    def test_constant_series_zero_deviation(self, tmp_path):
        sf = _write_events(tmp_path / "c", [2.0] * 8)
        r = cusum_changepoint(sf).take_all()[0]
        assert r["dmax"] == 0 and r["k_index"] == 1  # smallest-k tie-break

    def test_single_day_empty(self, tmp_path):
        sf = _write_events(tmp_path / "one", [3.0])
        assert cusum_changepoint(sf).take_all() == []

    def test_multiple_events_per_day_fold(self, tmp_path):
        d = tmp_path / "m"
        d.mkdir(parents=True)
        ts = [dt.datetime(2024, 1, 1, 2), dt.datetime(2024, 1, 1, 20),
              dt.datetime(2024, 1, 2, 5), dt.datetime(2024, 1, 3, 5)]
        pq.write_table(
            pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                      "value": [1.0, 1.0, 2.0, 10.0]}),
            str(d / "events.parquet"),
        )
        r = cusum_changepoint(str(d)).take_all()[0]
        # daily cents: [200, 200, 1000]; S=[200,400]; T=3, St=1400
        # D1=3*200-1400=-800, D2=3*400-2*1400=-1600 -> k=2
        assert r["k_index"] == 2 and r["dmax"] == 1600
