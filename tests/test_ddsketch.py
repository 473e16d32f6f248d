"""DDSketch mergeable log-bucket quantiles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.profile import DD_GAMMA, ddsketch_quantiles


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


@pytest.mark.usefixtures("ray_session")
class TestDDSketch:
    def test_relative_error_guarantee(self, tmp_path):
        # uniform 1..10000: every estimate must be within the 2% DDSketch
        # relative-error bound of the true quantile value
        vals = [float(v) for v in range(1, 10001)]
        sf = _write_li(tmp_path / "u", [("A", v) for v in vals])
        for r in ddsketch_quantiles(sf).take_all():
            q = r["q_pct"] / 100.0
            true = float(np.quantile(vals, q, method="lower"))
            est = r["est_q4"] / 10_000.0
            rel = abs(est - true) / true
            assert rel <= (DD_GAMMA - 1) / (DD_GAMMA + 1) + 0.02, (q, est, true)

    def test_single_value_exactish(self, tmp_path):
        sf = _write_li(tmp_path / "s", [("B", 500.0)] * 7)
        for r in ddsketch_quantiles(sf).take_all():
            assert abs(r["est_q4"] / 10_000.0 - 500.0) / 500.0 <= 0.02
            assert r["n"] == 7

    def test_merge_order_free(self, tmp_path):
        # the same rows in two different file orders -> identical sketch
        rng = np.random.default_rng(2)
        vals = rng.lognormal(mean=5, sigma=1, size=5000).round(2)
        rows = [("A", float(v)) for v in vals]
        a = ddsketch_quantiles(_write_li(tmp_path / "f", rows)).to_pandas()
        b = ddsketch_quantiles(_write_li(tmp_path / "r", rows[::-1])).to_pandas()
        assert a.equals(b)
