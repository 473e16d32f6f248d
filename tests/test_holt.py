"""Holt fixed-point forecast over the daily cents series."""

from __future__ import annotations

import datetime as dt
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import holt_rows
from ocr_engine_ray.pipelines.rankstats import holt_forecast, holt_forecast_digest

SF_GATE = "/root/testdata/sf0.01"


def _computed(sf: str) -> tuple[int, int]:
    """Round-5: the twin is COMPUTED SQL (`_holt_sql`) — run it."""
    import duckdb

    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS"
        f" SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    return con.execute(e.oracle_sql()["holt_forecast_digest"]).fetchone()


def test_computed_twin_matches_oracle():
    # two scales: proves the twin genuinely recomputes
    assert _computed(SF_GATE) == holt_rows(SF_GATE)
    assert _computed("/root/testdata/sf0.001") == holt_rows(
        "/root/testdata/sf0.001"
    )


def _write_events(d, day_values):
    d.mkdir(parents=True)
    ts = [
        dt.datetime(2024, 3, 1) + dt.timedelta(days=i, hours=2)
        for i in range(len(day_values))
    ]
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "value": [float(v) for v in day_values],
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestHolt:
    def test_constant_series_forecasts_constant(self, tmp_path):
        sf = _write_events(tmp_path / "c", [5.0] * 30)
        fc = holt_forecast(sf).column("forecast_cents").to_pylist()
        assert fc == [500] * 7  # level locks to 500 cents, trend 0

    def test_linear_trend_extrapolates(self, tmp_path):
        # steadily rising: forecasts must keep rising with h
        sf = _write_events(tmp_path / "t", [float(10 + 2 * i) for i in range(40)])
        fc = holt_forecast(sf).column("forecast_cents").to_pylist()
        assert all(b > a for a, b in zip(fc, fc[1:]))
        # slope ~200 cents/day once the trend state converges
        assert 150 <= fc[1] - fc[0] <= 250

    def test_engine_matches_sequential_twin(self, tmp_path):
        sf = _write_events(tmp_path / "m", [3.5, 0.0, 7.25, 2.0, 9.9, 4.4])
        t = holt_forecast_digest(sf)
        eng = (t.column("n_h")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == holt_rows(sf)
