"""Referential-integrity audit (pipelines/diagnostics.py:referential_integrity_audit)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.diagnostics import referential_integrity_audit

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirty_fk_sf(tmp_path):
    """Planted violations: orphan child keys (one repeated across rows),
    null child keys, and a duplicate parent key (must not double-count)."""
    pq.write_table(
        pa.table({"o_orderkey": pa.array([1, 2, 2], pa.int64()),
                  "o_custkey": pa.array([10, 10, None], pa.int64())}),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table({"l_orderkey": pa.array([1, 2, 99, 99, 77, None], pa.int64())}),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([10], pa.int64()),
                  "c_nationkey": pa.array([5], pa.int64())}),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({"n_nationkey": pa.array([5], pa.int64())}),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table({"s_suppkey": pa.array([1], pa.int64()),
                  "s_nationkey": pa.array([6], pa.int64())}),
        str(tmp_path / "supplier.parquet"),
    )
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestFkAudit:
    def test_planted_orphans(self, dirty_fk_sf):
        rows = {
            r["relation"]: (
                r["n_child_rows"], r["n_null_keys"],
                r["n_orphan_rows"], r["n_orphan_keys"],
            )
            for r in referential_integrity_audit(dirty_fk_sf).take_all()
        }
        # lineitem: 6 rows, 1 null, orphans 99 (×2 rows) + 77 → 3 rows / 2 keys
        assert rows["lineitem.l_orderkey->orders"] == (6, 1, 3, 2)
        # orders: 3 rows, 1 null custkey, no orphans
        assert rows["orders.o_custkey->customer"] == (3, 1, 0, 0)
        assert rows["customer.c_nationkey->nation"] == (1, 0, 0, 0)
        # supplier nationkey 6 has no nation row
        assert rows["supplier.s_nationkey->nation"] == (1, 0, 1, 1)

    def test_bucket_invariance(self, dirty_fk_sf):
        a = referential_integrity_audit(dirty_fk_sf, num_buckets=1).take_all()
        b = referential_integrity_audit(dirty_fk_sf, num_buckets=64).take_all()
        assert a == b

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = referential_integrity_audit(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        for t in ("lineitem", "orders", "customer", "nation", "supplier"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            )
        want = con.execute(e.oracle_sql()["referential_integrity_audit"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
