"""Planted-event tests for the per-user transition matrix: consecutive-pair
semantics (user-local, ts/event_id order), exact ppm arithmetic, the DuckDB
lead() twin, and bucket invariance."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_engine_ray.pipelines import analytics


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2026, 2, 1, 9, minute, 0)


def _write(tmp_path) -> str:
    events = [
        # user 1: view -> click -> view -> purchase (3 transitions)
        (1, "view", 0), (1, "click", 1), (1, "view", 2), (1, "purchase", 3),
        # user 2: single event -> NO transition
        (2, "view", 0),
        # user 3: two simultaneous events — order falls to event_id
        # (ids ascend with list position): error then click
        (3, "error", 5), (3, "click", 5),
        # user 4: view -> view self-transition
        (4, "view", 1), (4, "view", 2),
    ]
    rows = [
        {"event_id": i, "user_id": u, "ts": _ts(m), "event_type": t,
         "value": 1.0, "props": "{}"}
        for i, (u, t, m) in enumerate(events)
    ]
    d = tmp_path / "trans"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "events.parquet"))
    return str(d)


def test_planted_transitions(ray_session, tmp_path):
    sf = _write(tmp_path)
    t = analytics.event_transitions(sf)
    got = {(r["prev_type"], r["next_type"]): (r["n"], r["out_total"], r["p_ppm"])
           for r in t.to_pylist()}
    assert got == {
        ("view", "click"): (1, 3, 333333),       # 3 outgoing views total
        ("view", "purchase"): (1, 3, 333333),
        ("view", "view"): (1, 3, 333333),
        ("click", "view"): (1, 1, 1000000),
        ("error", "click"): (1, 1, 1000000),      # event_id breaks the ts tie
    }
    # sorted (prev_type, next_type) output order
    keys = list(zip(t.column("prev_type").to_pylist(),
                    t.column("next_type").to_pylist()))
    assert keys == sorted(keys)


def test_matches_duckdb_twin(ray_session, tmp_path):
    import duckdb

    import __ray_entry__ as entry

    sf = _write(tmp_path)
    got = analytics.event_transitions(sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(entry.oracle_sql()["event_transitions"]).fetchall()
    assert [
        (r["prev_type"], r["next_type"], r["n"], r["out_total"], r["p_ppm"])
        for r in got.to_pylist()
    ] == [tuple(w) for w in want]


def test_bucket_invariance_and_mass(ray_session):
    sf = "/root/testdata/sf0.001"
    a = analytics.event_transitions(sf, num_buckets=3)
    b = analytics.event_transitions(sf, num_buckets=64)
    assert a.equals(b)
    # every user with k events contributes exactly k-1 transitions
    t = pq.read_table(f"{sf}/events.parquet", columns=["user_id"])
    per_user = t.column("user_id").to_pandas().value_counts()
    assert sum(a.column("n").to_pylist()) == int((per_user - 1).sum())


class TestCoverage:
    """Planted interval-union semantics for user_active_coverage."""

    def _write(self, tmp_path, events):
        rows = [
            {"event_id": i, "user_id": u, "ts": _ts(m), "event_type": "view",
             "value": 1.0, "props": "{}"}
            for i, (u, m) in enumerate(events)
        ]
        d = tmp_path / "cov"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "events.parquet"))
        return str(d)

    def test_planted_islands(self, ray_session, tmp_path):
        # window = 2 minutes
        sf = self._write(
            tmp_path,
            [
                (1, 0), (1, 1),          # overlap -> one island [0, 3)
                (1, 3),                  # touches [.., 3) -> merges: [0, 5)
                (1, 10),                 # gap -> second island [10, 12)
                (2, 0),                  # single event
            ],
        )
        got = {r["user_id"]: (r["n_islands"], r["covered_us"])
               for r in analytics.user_active_coverage(sf, window_min=2).take_all()}
        m = 60_000_000
        assert got == {1: (2, 5 * m + 2 * m), 2: (1, 2 * m)}

    def test_matches_twin_and_buckets(self, ray_session, tmp_path):
        import duckdb

        import __ray_entry__ as entry

        sf = self._write(
            tmp_path, [(u, m) for u in (1, 2, 3) for m in (0, 7, 29, 31, 45, 45)]
        )
        got = analytics.user_active_coverage(sf).take_all()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        want = con.execute(entry.oracle_sql()["user_active_coverage"]).fetchall()
        assert [(r["user_id"], r["n_islands"], r["covered_us"]) for r in got] == [
            tuple(w) for w in want
        ]
        a = analytics.user_active_coverage(sf, num_buckets=2).take_all()
        assert a == got


def test_cube_pricing_matches_twin_planted(ray_session, tmp_path):
    """CUBE over a planted lineitem with two flags x two years (incl. a
    fractional-cents row that exercises the cents rounding)."""
    import duckdb

    import __ray_entry__ as entry

    rows = []
    i = 0
    for flag, year, price in [
        ("A", 2020, 10.005), ("A", 2020, 1.0), ("A", 2021, 2.5),
        ("R", 2020, 7.77), ("R", 2021, 0.01), ("R", 2021, 100.0),
    ]:
        rows.append(
            {"l_orderkey": i, "l_partkey": 1, "l_suppkey": 1, "l_linenumber": 1,
             "l_quantity": 1.0, "l_extendedprice": price, "l_discount": 0.1,
             "l_tax": 0.0, "l_returnflag": flag, "l_linestatus": "O",
             "l_shipdate": dt.datetime(year, 6, 1)}
        )
        i += 1
    d = tmp_path / "cube"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "lineitem.parquet"))
    got = [
        (r["l_returnflag"], r["ship_year"], r["sum_disc_price"], r["n_items"])
        for r in analytics.cube_pricing(str(d)).take_all()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
    )
    want = [
        tuple(w)
        for w in con.execute(entry.oracle_sql()["cube_pricing"]).fetchall()
    ]
    def key(t):
        return (t[0] is None, t[0] or "", t[1] is None, t[1] or 0)
    assert sorted(got, key=key) == sorted(want, key=key)
    assert len(got) == 4 + 2 + 2 + 1  # fine + flag marginal + year marginal + total


class TestTimeWeighted:
    def _write(self, tmp_path, events):
        """events: (user, second_offset, value)."""
        base = dt.datetime(2026, 3, 1, 8, 0, 0)
        rows = [
            {"event_id": i, "user_id": u, "ts": base + dt.timedelta(seconds=s),
             "event_type": "view", "value": v, "props": "{}"}
            for i, (u, s, v) in enumerate(events)
        ]
        d = tmp_path / "twa"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "events.parquet"))
        return str(d)

    def test_planted_locf_integral(self, ray_session, tmp_path):
        sf = self._write(
            tmp_path,
            [
                # user 1: 10.00 for 60s then 20.00 for 30s -> twa 13.33
                (1, 0, 10.0), (1, 60, 20.0), (1, 90, 0.0),
                # user 2: single event -> excluded
                (2, 0, 5.0),
                # user 3: sub-second gap truncates to 0s -> zero-weight
                (3, 0, 7.0), (3, 0, 9.0),
            ],
        )
        got = {r["user_id"]: (r["total_dur_s"], r["twa_cents"])
               for r in analytics.time_weighted_value(sf).take_all()}
        assert got[1] == (90, (1000 * 60 + 2000 * 30) // 90)  # 1333 cents
        assert 2 not in got
        assert got[3] == (0, 0)

    def test_matches_twin_and_buckets(self, ray_session, tmp_path):
        import duckdb

        import __ray_entry__ as entry

        sf = self._write(
            tmp_path,
            [(u, s, (u * 7 + s) % 40 + 0.25) for u in (1, 2, 5) for s in (0, 3, 10, 70, 100)],
        )
        got = analytics.time_weighted_value(sf).take_all()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        want = con.execute(entry.oracle_sql()["time_weighted_value"]).fetchall()
        assert [(r["user_id"], r["total_dur_s"], r["twa_cents"]) for r in got] == [
            tuple(w) for w in want
        ]
        assert analytics.time_weighted_value(sf, num_buckets=2).take_all() == got
