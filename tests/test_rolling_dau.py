"""Rolling distinct active users (pipelines/analytics.py:rolling_active_users)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import rolling_active_users

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dau_sf(tmp_path):
    """A user active twice in one window must count once; window-end days
    with no events of their own must NOT appear (only observed days do)."""
    d = dt.datetime(2024, 6, 1)

    def day(n, h=12):
        return d + dt.timedelta(days=n, hours=h)

    rows = [
        (0, 1, day(0)),
        (1, 1, day(1)),   # user 1 active days 0 and 1
        (2, 2, day(1)),
        (3, 3, day(10)),  # isolated far day — gap days 2..9 unobserved
        (4, None, day(2)),
        (5, 4, None),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestRollingActiveUsers:
    def test_window_semantics(self, dau_sf):
        rows = [
            (r["day"].day, r["active_users"])
            for r in rolling_active_users(dau_sf).take_all()
        ]
        # observed days: 1, 2, 11 (June).  Day 1: {1}. Day 2: {1,2} (user 1
        # twice in the window counts once).  Day 11: {3} (days 1-2 are
        # outside the trailing 7-day window).
        assert rows == [(1, 1), (2, 2), (11, 1)]

    def test_bucket_invariance(self, dau_sf):
        a = rolling_active_users(dau_sf, num_buckets=1).take_all()
        b = rolling_active_users(dau_sf, num_buckets=64).take_all()
        assert a == b

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = rolling_active_users(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        want = con.execute(e.oracle_sql()["rolling_active_users"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
