"""Join-size estimation: exact count + CMS inner-product bound."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.joins import join_size_estimate


def _write(d, order_keys, event_keys):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table({"o_custkey": pa.array(order_keys, pa.int64())}),
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(event_keys, pa.int64()),
                "ts": pa.array(
                    [dt.datetime(2024, 1, 1)] * len(event_keys), pa.timestamp("us")
                ),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestJoinSize:
    def test_exact_count_known(self, tmp_path):
        # key 1: 2x3 pairs; key 2: 1x1; key 3 only left -> 0
        sf = _write(tmp_path / "k", [1, 1, 2, 3], [1, 1, 1, 2])
        r = join_size_estimate(sf).take_all()[0]
        assert r["exact_rows"] == 2 * 3 + 1 * 1
        # CMS inner product is an UPPER bound on the true join size
        assert r["cms_estimate"] >= r["exact_rows"]
        assert r["err_ppm"] >= 0

    def test_no_matching_keys(self, tmp_path):
        sf = _write(tmp_path / "n", [1, 2], [3, 4])
        r = join_size_estimate(sf).take_all()[0]
        assert r["exact_rows"] == 0 and r["err_ppm"] == 0

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = join_size_estimate(sf, num_buckets=7).to_pandas()
        b = join_size_estimate(sf, num_buckets=64).to_pandas()
        assert a.equals(b)
