"""SCD Type-2 change history (pipelines/analytics.py:scd2_event_type_history)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import scd2_event_type_history

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def hist_sf(tmp_path):
    """Streams with runs, a null event_type run in the middle (IS DISTINCT
    FROM semantics), same-ts ties broken by event_id, and dirty rows."""
    base = dt.datetime(2024, 5, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: A A B (null) (null) A — 4 segments
        (0, 1, base + 0 * m, "A"),
        (1, 1, base + 1 * m, "A"),
        (2, 1, base + 2 * m, "B"),
        (3, 1, base + 3 * m, None),
        (4, 1, base + 4 * m, None),
        (5, 1, base + 5 * m, "A"),
        # user 2: tie on ts — event_id order decides run structure: A then B
        (6, 2, base, "A"),
        (7, 2, base, "B"),
        # dirty rows dropped
        (8, None, base, "A"),
        (9, 3, None, "A"),
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
class TestScd2:
    def test_run_semantics(self, hist_sf):
        rows = [
            (r["user_id"], r["seg_id"], r["event_type"], r["n_events"],
             bool(pd.isna(r["valid_to"])))
            for r in scd2_event_type_history(hist_sf).take_all()
        ]
        assert rows == [
            (1, 1, "A", 2, False),
            (1, 2, "B", 1, False),
            (1, 3, None, 2, False),
            (1, 4, "A", 1, True),   # open current segment
            (2, 1, "A", 1, False),
            (2, 2, "B", 1, True),
        ]

    def test_valid_to_chains(self, hist_sf):
        df = scd2_event_type_history(hist_sf).to_pandas()
        for _, g in df.groupby("user_id"):
            g = g.sort_values("seg_id")
            # each segment's valid_to equals the next segment's valid_from
            assert (
                g["valid_to"].iloc[:-1].reset_index(drop=True)
                == g["valid_from"].iloc[1:].reset_index(drop=True)
            ).all()
            assert pd.isna(g["valid_to"].iloc[-1])

    def test_bucket_invariance(self, hist_sf):
        a = scd2_event_type_history(hist_sf, num_buckets=1).take_all()
        b = scd2_event_type_history(hist_sf, num_buckets=64).take_all()
        assert a == b

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = scd2_event_type_history(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        want = con.execute(e.oracle_sql()["scd2_history"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
