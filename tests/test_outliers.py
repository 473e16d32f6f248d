"""Robust median/MAD outlier profiling on the doubled-cents grid."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.profile import _grid_kth2, price_outliers


def _write_part(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(list(range(len(rows))), pa.int64()),
                "p_brand": pa.array([r[0] for r in rows], pa.string()),
                "p_retailprice": pa.array([r[1] for r in rows], pa.float64()),
            }
        ),
        str(d / "part.parquet"),
    )
    return str(d)


class TestGridMedian:
    def test_matches_numpy_median_doubled(self):
        rng = np.random.default_rng(3)
        for _ in range(200):
            n = int(rng.integers(1, 40))
            xs = rng.integers(0, 20, size=n).astype(np.int64)
            vals, cnt = np.unique(xs, return_counts=True)
            assert _grid_kth2(vals, cnt, n) == int(round(2 * float(np.median(xs))))


@pytest.mark.usefixtures("ray_session")
class TestPriceOutliers:
    def test_planted_fence(self, tmp_path):
        # brand A: prices 10.00 ×5 and one 99.99 → MAD 0, outlier = any dev
        # brand B: symmetric spread, no outlier beyond 3×MAD
        rows = [("A", 10.0)] * 5 + [("A", 99.99)]
        rows += [("B", 1.0), ("B", 2.0), ("B", 3.0), ("B", 4.0), ("B", 5.0)]
        sf = _write_part(tmp_path / "p", rows)
        got = {r["p_brand"]: r for r in price_outliers(sf).take_all()}
        a = got["A"]
        assert a["n_parts"] == 6
        assert a["med2_cents"] == 2000  # median 10.00
        assert a["mad4_cents"] == 0
        assert a["n_outliers"] == 1  # only the 99.99
        b = got["B"]
        assert b["med2_cents"] == 600  # median 3.00
        # devs (cents): 200,100,0,100,200 → MAD = 100 → mad4 = 400
        assert b["mad4_cents"] == 400
        assert b["n_outliers"] == 0  # max dev 200 ≤ 3×100

    def test_even_count_midpoint(self, tmp_path):
        rows = [("C", 1.00), ("C", 2.00), ("C", 4.00), ("C", 8.00)]
        sf = _write_part(tmp_path / "m", rows)
        got = price_outliers(sf).take_all()[0]
        assert got["med2_cents"] == 600  # (200+400) — median 3.00
        # devs2 = |2c − 600|: 400, 200, 200, 1000 → sorted 200,200,400,1000
        # mad4 = 200+400 = 600 (MAD 1.50)
        assert got["mad4_cents"] == 600
        # fence: 2·dev2 > 3·mad4=1800 → only 2·1000=2000 → one outlier
        assert got["n_outliers"] == 1

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = price_outliers(sf, num_buckets=2).to_pandas()
        b = price_outliers(sf, num_buckets=16).to_pandas()
        assert a.equals(b)
