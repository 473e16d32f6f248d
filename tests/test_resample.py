"""Hourly resample + forward fill (pipelines/analytics.py:resample_hourly_ffill)."""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import resample_hourly_ffill

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def gap_sf(tmp_path):
    """Hand-built stream exercising every fill case: multi-hour gaps, a
    null value LAST in its hour (fill must reach back), a user whose first
    events are all null-valued (leading NULL grid rows), null user/ts rows."""
    base = dt.datetime(2024, 3, 1, 0, 5, 0)
    rows = [
        # user 1: values at h0, gap h1-h3, value at h4; null value at end of h0
        (0, 1, base, 5.00),
        (1, 1, base + dt.timedelta(minutes=10), None),  # hour ends null → 500
        (2, 1, base + dt.timedelta(hours=4), 7.25),
        # user 2: leading null-valued hour, then a value two hours later
        (3, 2, base, None),
        (4, 2, base + dt.timedelta(hours=2), 1.10),
        # dirty rows
        (5, None, base, 9.99),
        (6, 3, None, 9.99),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestResampleFfill:
    def test_fill_semantics(self, gap_sf):
        rows = [
            (r["user_id"], r["hr"].hour, r["last_cents"])
            for r in resample_hourly_ffill(gap_sf).take_all()
        ]
        assert rows == [
            (1, 0, 500),  # last non-null in hour 0 (null tail reaches back)
            (1, 1, 500),  # gap hours inherit
            (1, 2, 500),
            (1, 3, 500),
            (1, 4, 725),
            (2, 0, None),  # no non-null value observed yet
            (2, 1, None),
            (2, 2, 110),
        ]

    def test_bucket_invariance(self, gap_sf):
        a = resample_hourly_ffill(gap_sf, num_buckets=1).take_all()
        b = resample_hourly_ffill(gap_sf, num_buckets=64).take_all()
        assert a == b

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = resample_hourly_ffill(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        want = con.execute(e.oracle_sql()["resample_hourly_ffill"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_grid_is_contiguous_per_user(self, gap_sf):
        df = resample_hourly_ffill(gap_sf).to_pandas()
        for _, g in df.groupby("user_id"):
            hrs = g["hr"].astype("int64").to_numpy()
            assert np.all(np.diff(hrs) == 3_600_000_000)
