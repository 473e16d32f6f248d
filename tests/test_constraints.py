"""Deequ-style constraint validation suite."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.diagnostics import (
    validate_constraints,
    validate_constraints_sql,
)


def _write_star(d, *, dirty: bool):
    d.mkdir(parents=True)
    ok2 = 1 if dirty else 2  # duplicate o_orderkey when dirty
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 2 if dirty else 3], pa.int64()),
                "c_mktsegment": pa.array(["A", None if dirty else "B", "C"]),
            }
        ),
        str(d / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, ok2, 3], pa.int64()),
                "o_orderstatus": pa.array(["F", "O", "X" if dirty else "P"]),
                "o_totalprice": pa.array([10.0, -1.0 if dirty else 1.0, 5.0]),
            }
        ),
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_discount": pa.array([0.1, 1.5 if dirty else 0.5, None]),
                "l_quantity": pa.array([1.0, 0.0 if dirty else 2.0, 3.0]),
                "l_returnflag": pa.array(["A", "Z" if dirty else "N", "R"]),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(
                    [dt.datetime(2024, 1, 1), None if dirty else dt.datetime(2024, 1, 2)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1, None if dirty else 2], pa.int64()),
            }
        ),
        str(d / "events.parquet"),
    )
    pq.write_table(
        pa.table({"p_size": pa.array([1, 99 if dirty else 50], pa.int32())}),
        str(d / "part.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestValidateConstraints:
    def test_clean_star_passes_everything(self, tmp_path):
        sf = _write_star(tmp_path / "clean", dirty=False)
        got = validate_constraints(sf).take_all()
        assert len(got) == 11
        assert all(r["passed"] for r in got)
        assert all(r["n_violations"] == 0 for r in got)

    def test_planted_violations_found(self, tmp_path):
        sf = _write_star(tmp_path / "dirty", dirty=True)
        got = {r["check_name"]: r for r in validate_constraints(sf).take_all()}
        assert got["customer.c_custkey.unique"]["n_violations"] == 1
        assert got["customer.c_mktsegment.complete"]["n_violations"] == 1
        assert got["orders.o_orderkey.unique"]["n_violations"] == 1
        assert got["orders.o_orderstatus.in_set"]["n_violations"] == 1
        assert got["orders.o_totalprice.positive"]["n_violations"] == 1
        assert got["lineitem.l_discount.range"]["n_violations"] == 1  # null skipped
        assert got["lineitem.l_quantity.positive"]["n_violations"] == 1
        assert got["lineitem.l_returnflag.in_set"]["n_violations"] == 1
        assert got["events.ts.complete"]["n_violations"] == 1
        assert got["events.user_id.complete"]["n_violations"] == 1
        assert got["part.p_size.range"]["n_violations"] == 1
        assert not any(r["passed"] for r in got.values())

    def test_matches_twin_on_dirty(self, tmp_path):
        import duckdb

        sf = _write_star(tmp_path / "twin", dirty=True)
        got = validate_constraints(sf).to_pandas()
        con = duckdb.connect()
        for t in ("customer", "orders", "lineitem", "events", "part"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        want = con.execute(validate_constraints_sql()).df()
        assert got.equals(want)

    def test_bucket_invariance(self, tmp_path):
        sf = _write_star(tmp_path / "b", dirty=True)
        a = validate_constraints(sf, num_buckets=2).to_pandas()
        b = validate_constraints(sf, num_buckets=32).to_pandas()
        assert a.equals(b)
