"""Event debounce (pipelines/analytics.py:debounce_events)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import debounce_events

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def burst_sf(tmp_path):
    """A burst inside the gap, a repeat exactly AT the gap boundary
    (strict >, so dropped), a different event_type interleaved (kept),
    and null-type rows that partition together."""
    base = dt.datetime(2024, 8, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        (0, 1, base, "click"),
        (1, 1, base + 10 * s, "click"),          # 10s gap → dropped
        (2, 1, base + 20 * s, "view"),           # other type → kept
        (3, 1, base + 300 * s, "click"),         # == 5 min from event 1 → dropped
        (4, 1, base + 611 * s, "click"),         # 311s > 300s gap → kept
        (5, 2, base, None),
        (6, 2, base + 5 * s, None),              # null types debounce together
        (7, None, base, "click"),
        (8, 3, None, "click"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestDebounce:
    def test_keep_semantics(self, burst_sf):
        kept = [r["event_id"] for r in debounce_events(burst_sf).take_all()]
        assert kept == [0, 2, 4, 5]

    def test_bucket_invariance(self, burst_sf):
        a = debounce_events(burst_sf, num_buckets=1).take_all()
        b = debounce_events(burst_sf, num_buckets=64).take_all()
        assert a == b

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = debounce_events(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        want = con.execute(e.oracle_sql()["debounce_events"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
