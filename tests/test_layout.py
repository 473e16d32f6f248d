"""Z-order layout: twin equality, bucket invariance, manifest structure,
and the point of the whole exercise — the manifest actually PRUNES better
than time-ordered ingest for a single-user query."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.layout import US_PER_DAY, _morton32, zorder_layout

SF = "/root/testdata/sf0.001"


def test_morton_reference():
    # hand-computed: x=0b101 (bits at 0,2 -> positions 0,4), y=0b011
    # (bits at 0,1 -> positions 1,3)
    assert _morton32(np.array([0b101]), np.array([0b011]))[0] == 0b11011
    # full-width corners
    assert _morton32(np.array([0xFFFF]), np.array([0]))[0] == 0x55555555
    assert _morton32(np.array([0]), np.array([0xFFFF]))[0] == 0xAAAAAAAA


def test_bucket_invariance(ray_session):
    a = zorder_layout(SF, file_rows=128, num_buckets=4).take_all()
    b = zorder_layout(SF, file_rows=128, num_buckets=64).take_all()
    assert a == b


def test_manifest_structure(ray_session):
    rows = zorder_layout(SF, file_rows=128).take_all()
    n = pq.read_metadata(f"{SF}/events.parquet").num_rows
    assert sum(r["n_rows"] for r in rows) == n
    assert [r["file_id"] for r in rows] == list(range(len(rows)))
    assert all(r["n_rows"] == 128 for r in rows[:-1])  # full files except last
    assert all(r["min_user"] <= r["max_user"] for r in rows)


def test_pruning_beats_time_order(ray_session):
    """For a single-user point query, the z-ordered manifest touches
    strictly fewer files than the same-size files in arrival (event_id)
    order — the reason the operator exists."""
    rows = zorder_layout(SF, file_rows=64).take_all()

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    uid = np.asarray(t.column("user_id"))
    order = np.argsort(np.asarray(t.column("event_id")), kind="stable")
    uid_arrival = uid[order]
    n_files = len(rows)

    probes = sorted(set(uid))[:5]
    z_hits = time_hits = 0
    for u in probes:
        z_hits += sum(1 for r in rows if r["min_user"] <= u <= r["max_user"])
        for f in range(n_files):
            chunk = uid_arrival[f * 64 : (f + 1) * 64]
            if len(chunk) and chunk.min() <= u <= chunk.max():
                time_hits += 1
    assert z_hits < time_hits, (z_hits, time_hits)


def test_matches_twin_on_planted_grid(ray_session, tmp_path):
    """A dense 32x32 (user, day) grid exercises every interleave bit
    pattern; duplicate (user, day) cells break ties by event_id."""
    import datetime as dt

    import duckdb
    import pyarrow as pa

    from ocr_engine_ray.pipelines.layout import zorder_sql

    rows = []
    i = 0
    for u in range(32):
        for d in range(32):
            rows.append(
                {
                    "event_id": i,
                    "user_id": u * 3 + 7,
                    "ts": dt.datetime(2024, 1, 1) + dt.timedelta(days=d, hours=u % 24),
                    "event_type": "view",
                    "value": 1.0,
                    "props": "{}",
                }
            )
            i += 1
    dirp = tmp_path / "grid"
    dirp.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(dirp / "events.parquet"))
    got = zorder_layout(str(dirp), file_rows=100).take_all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{dirp}/events.parquet')"
    )
    want = con.execute(zorder_sql(file_rows=100)).fetchall()
    assert [
        (r["file_id"], r["n_rows"], r["min_user"], r["max_user"], r["min_day"], r["max_day"])
        for r in got
    ] == [tuple(w) for w in want]


def test_null_rows_ignored(ray_session, tmp_path):
    """Rows with null user/ts drop on both sides (twin WHERE parity)."""
    import datetime as dt

    import duckdb
    import pyarrow as pa

    from ocr_engine_ray.pipelines.layout import zorder_sql

    rows = [
        {"event_id": i, "user_id": u, "ts": ts, "event_type": "view",
         "value": 1.0, "props": "{}"}
        for i, (u, ts) in enumerate(
            [(1, dt.datetime(2024, 1, 1)), (None, dt.datetime(2024, 1, 2)),
             (2, None), (3, dt.datetime(2024, 2, 1))]
        )
    ]
    d = tmp_path / "nulls"
    d.mkdir()
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pylist(rows), str(d / "events.parquet"))
    got = zorder_layout(str(d), file_rows=10).take_all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    want = con.execute(zorder_sql(file_rows=10)).fetchall()
    assert [tuple(r.values()) for r in got] == [tuple(w) for w in want]
    assert sum(r["n_rows"] for r in got) == 2
