"""Childless-parent coverage audit."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.diagnostics import coverage_audit


@pytest.mark.usefixtures("ray_session")
class TestCoverageAudit:
    def test_planted_childless(self, tmp_path):
        d = tmp_path / "c"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                    "o_custkey": pa.array([10, 10, 11], pa.int64()),
                }
            ),
            str(d / "orders.parquet"),
        )
        pq.write_table(
            pa.table({"l_orderkey": pa.array([1, 1, 3], pa.int64())}),
            str(d / "lineitem.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([10, 11, 12], pa.int64()),
                    "c_nationkey": pa.array([0, 0, 1], pa.int32()),
                }
            ),
            str(d / "customer.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "n_nationkey": pa.array([0, 1, 2], pa.int32()),
                }
            ),
            str(d / "nation.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "s_suppkey": pa.array([1], pa.int64()),
                    "s_nationkey": pa.array([2], pa.int32()),
                }
            ),
            str(d / "supplier.parquet"),
        )
        got = {r["relation"]: r for r in coverage_audit(str(d)).take_all()}
        li = got["lineitem.l_orderkey->orders"]
        assert (li["n_parent_rows"], li["n_covered"], li["n_childless"]) == (3, 2, 1)
        oc = got["orders.o_custkey->customer"]
        assert (oc["n_covered"], oc["n_childless"]) == (2, 1)  # cust 12 idle
        cn = got["customer.c_nationkey->nation"]
        assert (cn["n_covered"], cn["n_childless"]) == (2, 1)  # nation 2 no cust
        sn = got["supplier.s_nationkey->nation"]
        assert (sn["n_covered"], sn["n_childless"]) == (1, 2)

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = coverage_audit(sf, num_buckets=2).to_pandas()
        b = coverage_audit(sf, num_buckets=32).to_pandas()
        assert a.equals(b)
