"""Skew report: planted hot-key distribution, exact salt arithmetic, twin
equality, and tie-break determinism."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_engine_ray.pipelines.diagnostics import skew_report, skew_report_sql


def _write(tmp_path, counts: dict[int, int]) -> str:
    rows = []
    i = 0
    for key, n in counts.items():
        for _ in range(n):
            rows.append({"l_partkey": key, "l_orderkey": i})
            i += 1
    d = tmp_path / "skew"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "lineitem.parquet"))
    return str(d)


def test_planted_hot_key(ray_session, tmp_path):
    # one hot key (60 of 100 rows), a tie pair, and a long tail
    counts = {7: 60, 3: 10, 5: 10, 11: 5} | {100 + i: 1 for i in range(15)}
    sf = _write(tmp_path, counts)
    t = skew_report(sf, top_k=4, num_partitions=10)
    assert t.column("rank").to_pylist() == [1, 2, 3, 4]
    # tie between keys 3 and 5 breaks by key ASC
    assert t.column("key").to_pylist() == [7, 3, 5, 11]
    assert t.column("n_rows_key").to_pylist() == [60, 10, 10, 5]
    assert t.column("total_rows").to_pylist()[0] == 100
    assert t.column("n_keys").to_pylist()[0] == 19
    assert t.column("max_key_rows").to_pylist()[0] == 60
    # ceil(60 * 10 / 100) = 6: split the hot key six ways
    assert t.column("salt_factor").to_pylist()[0] == 6
    assert t.column("pct_ppm").to_pylist() == [600000, 100000, 100000, 50000]


def test_matches_twin_planted(ray_session, tmp_path):
    import duckdb

    counts = {1: 13, 2: 13, 3: 1, 4: 7}
    sf = _write(tmp_path, counts)
    got = skew_report(sf, top_k=3, num_partitions=16)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
    )
    want = con.execute(skew_report_sql(top_k=3, num_partitions=16)).fetchall()
    assert list(
        zip(*[got.column(c).to_pylist() for c in got.column_names])
    ) == [tuple(w) for w in want]


def test_uniform_keys_salt_one(ray_session, tmp_path):
    sf = _write(tmp_path, {i: 4 for i in range(32)})
    t = skew_report(sf, top_k=2, num_partitions=16)
    # max 4 of 128 rows, 16 partitions -> ceil(64/128) = 1: no salting needed
    assert t.column("salt_factor").to_pylist()[0] == 1


def test_null_keys_ignored(ray_session, tmp_path):
    import duckdb

    rows = [{"l_partkey": k, "l_orderkey": i}
            for i, k in enumerate([1, 1, None, 2, None, 1])]
    d = tmp_path / "nullskew"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "lineitem.parquet"))
    t = skew_report(str(d), top_k=3, num_partitions=4)
    assert t.column("total_rows").to_pylist()[0] == 4  # nulls excluded
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
    )
    want = con.execute(skew_report_sql(top_k=3, num_partitions=4)).fetchall()
    assert list(zip(*[t.column(c).to_pylist() for c in t.column_names])) == [
        tuple(w) for w in want
    ]
