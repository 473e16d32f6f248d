"""Poisson-bootstrap confidence interval for the mean order value."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.rankstats import (
    BOOT_CDF,
    bootstrap_order_value_ci,
)


def test_poisson_thresholds_are_cdf_of_unit_poisson():
    import math

    want = []
    acc = 0.0
    for k in range(8):
        acc += math.exp(-1) / math.factorial(k)
        want.append(acc)
    assert np.allclose(BOOT_CDF, want, rtol=0, atol=1e-12)
    # mean multiplicity under the capped inverse CDF is ~1
    u = np.random.default_rng(0).uniform(size=200_000)
    mult = np.zeros_like(u)
    for t in BOOT_CDF:
        mult += (u >= t).astype(float)
    assert abs(mult.mean() - 1.0) < 0.01


def _write_orders(d, prices):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(list(range(len(prices))), pa.int64()),
                "o_totalprice": pa.array([float(p) for p in prices]),
            }
        ),
        str(d / "orders.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestBootstrapCI:
    def test_interval_covers_and_orders(self, tmp_path):
        rng = np.random.default_rng(6)
        prices = rng.uniform(10, 500, size=2000).round(2)
        sf = _write_orders(tmp_path / "b", prices)
        r = bootstrap_order_value_ci(sf).take_all()[0]
        assert r["n_orders"] == 2000
        assert r["ci_lo_q4"] <= r["mean_q4"] <= r["ci_hi_q4"]
        # CI width for n=2000 uniform: a few std errors, not absurd
        # (q4 is on the CENTS grid: price units = q4 / 1e4 / 100)
        width_price = (r["ci_hi_q4"] - r["ci_lo_q4"]) / 1_000_000.0
        se = prices.std() / np.sqrt(len(prices))
        assert 1 * se < width_price < 8 * se

    def test_row_order_invariance(self, tmp_path):
        # same (orderkey, price) rows in reversed file order -> identical
        # CI (every fold is an exact integer sum)
        prices = [10.0, 20.5, 33.25, 47.0, 5.75] * 40
        keys = list(range(len(prices)))
        for name, kp in (("x", list(zip(keys, prices))),
                         ("y", list(zip(keys, prices))[::-1])):
            d = tmp_path / name
            d.mkdir(parents=True)
            pq.write_table(
                pa.table(
                    {
                        "o_orderkey": pa.array([k for k, _ in kp], pa.int64()),
                        "o_totalprice": pa.array([p for _, p in kp]),
                    }
                ),
                str(d / "orders.parquet"),
            )
        a = bootstrap_order_value_ci(str(tmp_path / "x")).to_pandas()
        b = bootstrap_order_value_ci(str(tmp_path / "y")).to_pandas()
        assert a.equals(b)
