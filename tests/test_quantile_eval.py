"""DDSketch-vs-exact quantile accuracy eval."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.profile import quantile_sketch_eval

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestQuantileEval:
    def test_guarantee_holds_on_real_data(self):
        t = quantile_sketch_eval(SF)
        rows = t.to_pylist()
        assert len(rows) == 3 * len({r["l_returnflag"] for r in rows})
        assert all(r["within_bound"] == 1 for r in rows)
        assert all(r["rel_err_ppm"] <= 9901 for r in rows)

    def test_exact_side_matches_numpy(self):
        li = pq.read_table(
            f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
        ).to_pylist()
        from collections import defaultdict

        per = defaultdict(list)
        for r in li:
            per[r["l_returnflag"]].append(int(round(r["l_extendedprice"] * 100)))
        got = {
            (r["l_returnflag"], r["q_pct"]): r["exact_cents"]
            for r in quantile_sketch_eval(SF).to_pylist()
        }
        for flag, vals in per.items():
            vals.sort()
            n = len(vals)
            for q_pct, qf in [(50, 0.5), (95, 0.95), (99, 0.99)]:
                k = int(np.floor(1 + qf * (n - 1)))
                assert got[(flag, q_pct)] == vals[k - 1], (flag, q_pct)
