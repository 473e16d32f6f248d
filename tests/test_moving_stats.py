"""Bounded-frame moving sums (pipelines/analytics.py:moving_event_stats)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import moving_event_stats

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def span_sf(tmp_path):
    """More days than the frame (exercises the cumsum-difference shift),
    plus an all-null-value day whose daily sum must stay NULL."""
    base = dt.datetime(2024, 9, 1)
    rows = []
    eid = 0
    for d in range(10):
        for _ in range(d + 1):  # day d has d+1 events of value 1.00
            rows.append((eid, base + dt.timedelta(days=d), "click", 1.00))
            eid += 1
    rows.append((eid, base + dt.timedelta(days=20), "click", None))  # null day
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestMovingStats:
    def test_frame_arithmetic(self, span_sf):
        df = moving_event_stats(span_sf).to_pandas()
        # day d (0-based) has d+1 events; trailing-7-row sum over observed
        # days = sum of (d-6..d)+1 clipped at 0
        for i in range(10):
            row = df.iloc[i]
            lo = max(0, i - 6)
            assert row["n_events"] == i + 1
            assert row["n_7d"] == sum(j + 1 for j in range(lo, i + 1))
        # the isolated null-value day: count 1, NULL daily cents, 7d sums
        # cover only observed ROWS (row-frame, not calendar range)
        last = df.iloc[10]
        assert last["n_events"] == 1 and pd.isna(last["value_cents"])
        assert last["n_7d"] == sum(j + 1 for j in range(4, 10)) + 1

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = moving_event_stats(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        want = con.execute(e.oracle_sql()["moving_event_stats"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
