"""Winsorized aggregates (exact rank-selected percentile clipping)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.profile import _grid_kth, winsorized_pricing


def _write_li(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
                "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    return str(d)


class TestGridKth:
    def test_matches_sorted_indexing(self):
        rng = np.random.default_rng(1)
        for _ in range(100):
            xs = rng.integers(0, 50, size=int(rng.integers(1, 60)))
            vals, cnt = np.unique(xs, return_counts=True)
            s = np.sort(xs)
            for k in (1, len(xs) // 2 + 1, len(xs)):
                assert _grid_kth(vals, cnt, k) == s[k - 1]


@pytest.mark.usefixtures("ray_session")
class TestWinsorizedPricing:
    def test_planted_clip(self, tmp_path):
        # 20 rows at flag A: 1..18 plus outliers 1000 and -500 (cents ×100)
        prices = list(range(1, 19)) + [1000, -500]
        sf = _write_li(tmp_path / "w", [("A", float(p)) for p in prices])
        got = winsorized_pricing(sf).take_all()[0]
        cents = sorted(p * 100 for p in prices)
        k_lo = max(1, math.ceil(0.05 * 20))  # 1
        k_hi = max(1, math.ceil(0.95 * 20))  # 19
        lo, hi = cents[k_lo - 1], cents[k_hi - 1]
        assert got["p05_cents"] == lo and got["p95_cents"] == hi
        want_sum = sum(min(max(c, lo), hi) for c in cents)
        assert got["winsorized_sum_cents"] == want_sum
        assert got["n_clipped_lo"] == sum(1 for c in cents if c < lo)
        assert got["n_clipped_hi"] == sum(1 for c in cents if c > hi)

    def test_single_row_group(self, tmp_path):
        sf = _write_li(tmp_path / "s", [("B", 5.0)])
        got = winsorized_pricing(sf).take_all()[0]
        assert got["p05_cents"] == got["p95_cents"] == 500
        assert got["winsorized_sum_cents"] == 500
        assert got["n_clipped_lo"] == got["n_clipped_hi"] == 0

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = winsorized_pricing(sf, num_buckets=2).to_pandas()
        b = winsorized_pricing(sf, num_buckets=16).to_pandas()
        assert a.equals(b)
