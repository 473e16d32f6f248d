"""Benford first-digit audit."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.profile import BENFORD_EXPECTED_PPM, benford_audit


def _write_orders(d, prices):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table({"o_totalprice": pa.array(prices, pa.float64())}),
        str(d / "orders.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestBenford:
    def test_digit_extraction_and_ppm(self, tmp_path):
        # cents: 100, 1999, 20000, 999999, 0 (dropped), 305 → digits 1,1,2,9,3
        sf = _write_orders(tmp_path / "b", [1.0, 19.99, 200.0, 9999.99, 0.0, 3.05])
        got = {r["digit"]: r for r in benford_audit(sf).take_all()}
        assert [got[d]["n"] for d in range(1, 10)] == [2, 1, 1, 0, 0, 0, 0, 0, 1]
        assert got[1]["observed_ppm"] == 2 * 1_000_000 // 5
        assert got[9]["observed_ppm"] == 1_000_000 // 5
        assert got[4]["n"] == 0 and got[4]["observed_ppm"] == 0

    def test_expected_constants(self):
        # digit 1 ≈ 30.103%, digit 9 ≈ 4.576%
        assert BENFORD_EXPECTED_PPM[0] == 301030
        assert BENFORD_EXPECTED_PPM[8] == 45757
        assert sum(BENFORD_EXPECTED_PPM) in (999999, 1000000, 1000001)
