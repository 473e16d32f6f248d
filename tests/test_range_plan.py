"""Range-partitioner plan with exact rank boundaries."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.diagnostics import range_partition_plan


def _write_li(d, prices):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table({"l_extendedprice": pa.array(prices, pa.float64())}),
        str(d / "lineitem.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestRangePlan:
    def test_boundaries_match_sorted_ranks(self, tmp_path):
        rng = np.random.default_rng(8)
        prices = (rng.integers(1, 5000, size=320) / 100.0).tolist()
        sf = _write_li(tmp_path / "p", prices)
        got = range_partition_plan(sf, num_parts=4).take_all()
        cents = np.sort(np.round(np.array(prices) * 100).astype(np.int64))
        n = len(cents)
        for r in got:
            k = max(1, (r["idx"] * n + 3) // 4)
            assert r["rank"] == k
            assert r["boundary_cents"] == cents[k - 1]
            assert r["n_le"] == int((cents <= r["boundary_cents"]).sum())

    def test_heavy_ties_reported(self, tmp_path):
        # one dominant value: every boundary collapses onto it and n_le
        # exposes the tie mass the executor must split by secondary key
        prices = [10.0] * 97 + [1.0, 2.0, 3.0]
        sf = _write_li(tmp_path / "t", prices)
        got = range_partition_plan(sf, num_parts=4).take_all()
        assert all(r["boundary_cents"] == 1000 for r in got)
        assert all(r["n_le"] == 100 for r in got)

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = range_partition_plan(sf, num_buckets=3).to_pandas()
        b = range_partition_plan(sf, num_buckets=64).to_pandas()
        assert a.equals(b)
