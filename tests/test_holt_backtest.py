"""Walk-forward Holt backtest."""

from __future__ import annotations

import re

import pytest

from ocr_engine_ray.oracle_dedup import holt_backtest_rows
from ocr_engine_ray.pipelines.rankstats import holt_backtest

SF = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


def _pinned():
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["holt_backtest"])
    assert len(nums) == 5
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == holt_backtest_rows(SF_GATE)


@pytest.mark.usefixtures("ray_session")
class TestHoltBacktest:
    def test_engine_matches_sequential_oracle(self):
        t = holt_backtest(SF)
        eng = tuple(t.column(c)[0].as_py() for c in t.column_names)
        assert eng == holt_backtest_rows(SF)

    def test_mae_consistency(self):
        t = holt_backtest(SF).to_pylist()[0]
        assert t["k_days"] == 28
        assert 0 <= t["holt_wins"] <= t["k_days"]
        want_imp = (
            (t["mae_naive_cents"] - t["mae_holt_cents"]) * 1_000_000
            // max(t["mae_naive_cents"], 1)
        )
        assert t["improvement_ppm"] == want_imp
