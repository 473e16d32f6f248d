"""Pearson correlation from exact integer moments."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.profile import pearson_price_qty


def _write_li(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
                "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
                "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestPearson:
    def test_perfect_and_anti_correlation(self, tmp_path):
        rows = [("A", float(i), float(2 * i + 5)) for i in range(1, 20)]
        rows += [("B", float(i), float(100 - 3 * i)) for i in range(1, 20)]
        rows += [("C", 7.0, float(i)) for i in range(1, 10)]  # x constant
        sf = _write_li(tmp_path / "p", rows)
        got = {r["l_returnflag"]: r["corr_ppm"] for r in pearson_price_qty(sf).take_all()}
        assert got["A"] == 1_000_000
        assert got["B"] == -1_000_000
        assert got["C"] == 0  # zero variance -> defined as 0

    def test_matches_numpy_corrcoef(self, tmp_path):
        rng = np.random.default_rng(9)
        x = rng.integers(1, 50, size=400).astype(float)
        y = x * 3 + rng.normal(scale=20, size=400).round(2)
        sf = _write_li(tmp_path / "n", [("A", float(a), float(b)) for a, b in zip(x, y)])
        got = pearson_price_qty(sf).take_all()[0]["corr_ppm"]
        want = np.corrcoef(np.round(x * 100), np.round(y * 100))[0, 1]
        assert abs(got / 1e6 - want) < 1e-6

    def test_chunk_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = pearson_price_qty(sf, chunk=64).to_pandas()
        b = pearson_price_qty(sf, chunk=8192).to_pandas()
        assert a.equals(b)
