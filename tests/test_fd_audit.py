"""Functional-dependency violation audit."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.diagnostics import fd_violation_audit


def _write(d, li_rows, ord_rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in li_rows], pa.int64()),
                "l_linestatus": pa.array([r[2] for r in li_rows], pa.string()),
                "l_returnflag": pa.array([r[3] for r in li_rows], pa.string()),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([r[0] for r in ord_rows], pa.int64()),
                "o_orderpriority": pa.array([r[1] for r in ord_rows], pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestFDAudit:
    def test_planted_violations(self, tmp_path):
        # orderkey -> linestatus: order 1 has two statuses (violation),
        # order 2 is consistent. partkey -> returnflag: part 7 violates.
        li = [
            (1, 7, "O", "N"),
            (1, 7, "F", "R"),
            (2, 8, "O", "N"),
            (2, 8, "O", "N"),  # duplicate pair: must not double-count
        ]
        orders = [(10, "1-URGENT"), (10, "1-URGENT"), (11, "2-HIGH")]
        sf = _write(tmp_path / "p", li, orders)
        got = {r["fd_name"]: r for r in fd_violation_audit(sf).take_all()}
        oks = got["orderkey_determines_status"]
        assert (oks["n_groups"], oks["n_violating"]) == (2, 1)
        assert oks["violation_ppm"] == 500_000
        pkb = got["partkey_determines_brand_flag"]
        assert (pkb["n_groups"], pkb["n_violating"]) == (2, 1)
        ckp = got["custkey_determines_priority"]
        assert (ckp["n_groups"], ckp["n_violating"]) == (2, 0)
        assert ckp["violation_ppm"] == 0
