"""Watermark late-event accounting (state/stream.py:watermark_late_events)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.state.stream import watermark_late_events

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def late_sf(tmp_path):
    """Out-of-order arrivals: event_id is arrival order; event 2 arrives
    after the watermark has advanced past its timestamp."""
    base = dt.datetime(2024, 7, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        (0, base),               # wm = base - 1h
        (1, base + 5 * h),       # wm jumps to base + 4h
        (2, base + 1 * h),       # ts < wm → LATE
        (3, base + 4 * h),       # ts == wm → on time (strict <)
        (4, base + 3 * h),       # ts < wm → LATE
        (5, None),               # dirty rows dropped
        (None, base),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestWatermarkLateEvents:
    def test_late_semantics(self, late_sf):
        rows = [
            (r["hour"].hour, r["status"], r["n"])
            for r in watermark_late_events(late_sf).take_all()
        ]
        assert rows == [
            (0, "ontime", 1),
            (1, "late", 1),
            (3, "late", 1),
            (4, "ontime", 1),
            (5, "ontime", 1),
        ]

    def test_bucket_invariance(self, late_sf):
        a = watermark_late_events(late_sf, num_buckets=1).take_all()
        b = watermark_late_events(late_sf, num_buckets=16).take_all()
        assert a == b

    def test_zero_lateness_marks_all_out_of_order(self, late_sf):
        rows = watermark_late_events(late_sf, lateness_us=0).take_all()
        late = sum(r["n"] for r in rows if r["status"] == "late")
        assert late == 3  # events 2, 3 and 4 are strictly behind the max

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = watermark_late_events(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        want = con.execute(e.oracle_sql()["watermark_late_events"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
