"""Planted-event tests for the ordered funnel: strict stage ordering,
missing stages, and the DuckDB chained-min twin."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_engine_ray.pipelines import analytics


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 12, minute, 0)


def _write(tmp_path) -> str:
    events = [
        # user 1: full funnel in order
        (1, "view", 0), (1, "click", 5), (1, "purchase", 9),
        # user 2: click BEFORE the first view -> must not count;
        # a later click does, but no purchase follows
        (2, "click", 0), (2, "view", 1), (2, "click", 3),
        # user 3: purchase before click -> stops at view+click
        (3, "view", 0), (3, "purchase", 1), (3, "click", 2),
        # user 4: no view at all -> absent
        (4, "click", 0), (4, "purchase", 1),
        # user 5: two views; funnel starts at the FIRST one
        (5, "view", 8), (5, "view", 2), (5, "click", 4), (5, "purchase", 6),
        # user 6: click at the same timestamp as the view -> strictly-after
        # rule rejects it; nothing later
        (6, "view", 7), (6, "click", 7),
    ]
    rows = [
        {"event_id": i, "user_id": u, "ts": _ts(m), "event_type": t,
         "value": 1.0, "props": "{}"}
        for i, (u, t, m) in enumerate(events)
    ]
    d = tmp_path / "funnel"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "events.parquet"))
    return str(d)


def test_planted_funnel_semantics(ray_session, tmp_path):
    sf = _write(tmp_path)
    got = {r["user_id"]: r for r in analytics.event_funnel(sf).take_all()}
    assert set(got) == {1, 2, 3, 5, 6}          # user 4 has no view
    assert got[1]["stages_completed"] == 3
    assert got[1]["t_purchase"] == _ts(9)
    assert got[2]["stages_completed"] == 2       # pre-view click ignored
    assert got[2]["t_click"] == _ts(3)
    assert got[3]["stages_completed"] == 2       # purchase precedes click
    assert got[3]["t_purchase"] is None
    assert got[5]["t_view"] == _ts(2)            # earliest view wins
    assert got[5]["stages_completed"] == 3
    assert got[6]["stages_completed"] == 1       # same-ts click rejected
    assert got[6]["t_click"] is None


def test_matches_duckdb_twin(ray_session, tmp_path):
    import duckdb

    import __ray_entry__ as entry

    sf = _write(tmp_path)
    got = analytics.event_funnel(sf).take_all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(
        entry.oracle_sql()["event_funnel"] + " ORDER BY user_id"
    ).fetchall()
    assert [
        (r["user_id"], r["t_view"], r["t_click"], r["t_purchase"],
         r["stages_completed"])
        for r in got
    ] == [tuple(w) for w in want]


def test_bucket_count_invariance(ray_session, tmp_path):
    sf = _write(tmp_path)
    a = analytics.event_funnel(sf, num_buckets=2).take_all()
    b = analytics.event_funnel(sf, num_buckets=64).take_all()
    assert a == b


def test_cohort_retention_planted(ray_session, tmp_path):
    """Hand-pinned cohorts: Mondays are 2026-01-05 / 12 / 19.  User 1
    cohorts in week 0 and returns in weeks 0 and 2 (gap week skipped);
    user 2 cohorts in week 0 (via a SUNDAY event — Monday truncation);
    user 3 cohorts in week 1."""
    import duckdb

    import __ray_entry__ as entry

    events = [
        (1, dt.datetime(2026, 1, 5, 10)),    # Monday wk0
        (1, dt.datetime(2026, 1, 6, 10)),    # same week -> one activity row
        (1, dt.datetime(2026, 1, 19, 10)),   # wk2
        (2, dt.datetime(2026, 1, 11, 23)),   # SUNDAY of wk0
        (3, dt.datetime(2026, 1, 12, 0)),    # Monday wk1
    ]
    rows = [
        {"event_id": i, "user_id": u, "ts": t, "event_type": "view",
         "value": 0.0, "props": "{}"}
        for i, (u, t) in enumerate(events)
    ]
    d = tmp_path / "cohorts"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "events.parquet"))
    got = [
        (r["cohort_week"], r["week_offset"], r["n_users"])
        for r in analytics.cohort_retention(str(d)).take_all()
    ]
    wk0, wk1 = dt.datetime(2026, 1, 5), dt.datetime(2026, 1, 12)
    assert got == [(wk0, 0, 2), (wk0, 2, 1), (wk1, 0, 1)]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    want = con.execute(
        entry.oracle_sql()["cohort_retention"] + " ORDER BY cohort_week, week_offset"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_dirty_events_ignored(ray_session, tmp_path):
    """Null user_id / ts / event_type rows are ignored by contract (and the
    float-NaN cast path a null int64 column would otherwise take cannot
    corrupt the timestamps)."""
    rows = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, None, 2, 1], pa.int64()),
        "ts": pa.array([dt.datetime(2026, 1, 5), None, dt.datetime(2026, 1, 6),
                        dt.datetime(2026, 1, 7), dt.datetime(2026, 1, 8)],
                       pa.timestamp("us")),
        "event_type": pa.array(["view", "click", None, "view", "click"],
                               pa.string()),
        "value": pa.array([0.0] * 5, pa.float64()),
        "props": pa.array(["{}"] * 5, pa.string()),
    })
    d = tmp_path / "dirty"
    d.mkdir()
    pq.write_table(rows, str(d / "events.parquet"))
    got = {r["user_id"]: r for r in analytics.event_funnel(str(d)).take_all()}
    # user 1: the null-ts click is ignored, the Jan-8 click counts
    assert got[1]["stages_completed"] == 2
    assert got[1]["t_click"] == dt.datetime(2026, 1, 8)
    assert got[2]["stages_completed"] == 1
    ret = analytics.cohort_retention(str(d)).take_all()
    # users 1 and 2 cohort in the week of Jan 5 (Monday); null rows ignored
    assert [(r["week_offset"], r["n_users"]) for r in ret] == [(0, 2)]
