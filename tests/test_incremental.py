"""Materialized-view maintenance (analytics.incremental_pricing)."""

from __future__ import annotations

import pytest

from ocr_engine_ray.pipelines import analytics

SF = "/root/testdata/sf0.001"


def _canon(rows):
    return sorted(tuple(sorted(r.items())) for r in rows)


@pytest.mark.usefixtures("ray_session")
class TestIncrementalPricing:
    def test_state_merge_equals_wholesale(self):
        whole = _canon(analytics.pricing_summary(SF).take_all())
        assert _canon(analytics.incremental_pricing(SF).take_all()) == whole

    def test_degenerate_splits(self):
        whole = _canon(analytics.pricing_summary(SF).take_all())
        # everything in the delta / everything in the view
        assert (
            _canon(analytics.incremental_pricing(SF, cutoff="1900-01-01").take_all())
            == whole
        )
        assert (
            _canon(analytics.incremental_pricing(SF, cutoff="2100-01-01").take_all())
            == whole
        )
