"""Kaplan-Meier life table over customer repurchase gaps."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.rankstats import repurchase_life_table


def _write_orders(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderdate": pa.array(
                    [dt.datetime(2024, 1, 1) + dt.timedelta(days=r[2]) for r in rows],
                    pa.timestamp("us"),
                ),
            }
        ),
        str(d / "orders.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestLifeTable:
    def test_small_known_table(self, tmp_path):
        # cust 1: orders at day 0, 3, 3 -> events gap 3 and gap 0,
        #         censored at 10-3 = 7
        # cust 2: single order at day 10 (the horizon) -> censored gap 0
        rows = [(1, 1, 0), (2, 1, 3), (3, 1, 3), (4, 2, 10)]
        sf = _write_orders(tmp_path / "k", rows)
        got = {r["gap_days"]: r for r in repurchase_life_table(sf).take_all()}
        assert set(got) == {0, 3, 7}
        assert (got[0]["n_events"], got[0]["n_censored"]) == (1, 1)
        assert (got[3]["n_events"], got[3]["n_censored"]) == (1, 0)
        assert (got[7]["n_events"], got[7]["n_censored"]) == (0, 1)
        # n_risk: reverse cumulative of (2, 1, 1)
        assert (got[0]["n_risk"], got[3]["n_risk"], got[7]["n_risk"]) == (4, 2, 1)
        assert got[3]["hazard_ppm"] == 500_000  # 1/2
        assert got[7]["hazard_ppm"] == 0

    def test_order_of_same_day_ties_by_orderkey(self, tmp_path):
        # two same-day orders produce a 0-day event regardless of row order
        rows = [(9, 5, 4), (8, 5, 4)]
        sf = _write_orders(tmp_path / "t", rows)
        got = {r["gap_days"]: r for r in repurchase_life_table(sf).take_all()}
        assert got[0]["n_events"] == 1 and got[0]["n_censored"] == 1

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = repurchase_life_table(sf, num_buckets=7).to_pandas()
        b = repurchase_life_table(sf, num_buckets=64).to_pandas()
        assert a.equals(b)
