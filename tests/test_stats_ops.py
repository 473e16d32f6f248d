"""ab_conversion_chisq / theil_sen_daily / gini_by_segment unit tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import ab_conversion_chisq, theil_sen_daily
from ocr_engine_ray.pipelines.profile import gini_by_segment


def _write_events(d, rows):
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestChiSquare:
    def test_hand_computed(self, tmp_path):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # variant 0 (even uids): users 0,2 purchase-dominant; 4,6 not
        for u in (0, 2):
            rows += [(u, "purchase", t0), (u, "purchase", t0), (u, "click", t0)]
        for u in (4, 6):
            rows += [(u, "click", t0), (u, "purchase", t0)]
        # variant 1 (odd uids): user 1 dominant; 3,5,7 not
        rows += [(1, "purchase", t0)]
        for u in (3, 5, 7):
            rows += [(u, "click", t0)]
        sf = _write_events(tmp_path / "e", rows)
        got = ab_conversion_chisq(sf).take_all()[0]
        assert (got["users_a"], got["conv_a"]) == (4, 2)
        assert (got["users_b"], got["conv_b"]) == (4, 1)
        a, b, c, d = 2, 2, 1, 3
        n = 8
        want = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
        assert got["chi2_milli"] == int(np.round(want * 1000))

    def test_degenerate_all_convert(self, tmp_path):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [(u, "purchase", t0) for u in range(6)]
        sf = _write_events(tmp_path / "g", rows)
        got = ab_conversion_chisq(sf).take_all()[0]
        assert got["chi2_milli"] == 0  # (b+d) == 0 guard


@pytest.mark.usefixtures("ray_session")
class TestTheilSen:
    def test_pure_linear_series(self, tmp_path):
        import datetime as dt

        rows = []
        for day in range(10):
            n = 5 + 3 * day  # slope exactly 3
            for i in range(n):
                rows.append((i, "view", dt.datetime(2024, 2, 1 + day, 12, 0, i % 60)))
        sf = _write_events(tmp_path / "lin", rows)
        got = theil_sen_daily(sf).take_all()[0]
        assert got["n_days"] == 10 and got["n_pairs"] == 45
        assert got["slope_ppm"] == 3_000_000

    def test_outlier_day_does_not_move_median(self, tmp_path):
        import datetime as dt

        rows = []
        for day in range(11):
            n = 5 + 3 * day + (1000 if day == 5 else 0)  # one spike day
            for i in range(n):
                rows.append((i, "view", dt.datetime(2024, 2, 1 + day, 12, 0, i % 60)))
        sf = _write_events(tmp_path / "out", rows)
        got = theil_sen_daily(sf).take_all()[0]
        # 10 of 11 points sit on the slope-3 line: the median pair is exact
        assert got["slope_ppm"] == 3_000_000


def _write_gini(d, cust, orders):
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([c[0] for c in cust], pa.int64()),
                "c_mktsegment": pa.array([c[1] for c in cust], pa.string()),
            }
        ),
        str(d / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_totalprice": pa.array([o[1] for o in orders], pa.float64()),
            }
        ),
        str(d / "orders.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestGini:
    def test_perfect_equality_is_zero(self, tmp_path):
        cust = [(i, "SEG") for i in range(8)]
        orders = [(i, 100.0) for i in range(8)]
        sf = _write_gini(tmp_path / "eq", cust, orders)
        got = gini_by_segment(sf).take_all()[0]
        assert got["gini_ppm"] == 0 and got["n_customers"] == 8

    def test_total_concentration_approaches_one(self, tmp_path):
        cust = [(i, "SEG") for i in range(100)]
        orders = [(i, 0.01) for i in range(99)] + [(99, 1_000_000.0)]
        sf = _write_gini(tmp_path / "conc", cust, orders)
        got = gini_by_segment(sf).take_all()[0]
        assert got["gini_ppm"] > 980_000

    def test_matches_direct_formula(self, tmp_path):
        rng = np.random.default_rng(4)
        vals = np.round(rng.lognormal(8, 1, size=60), 2)
        cust = [(i, "A" if i % 2 else "B") for i in range(60)]
        orders = [(i, float(v)) for i, v in enumerate(vals)]
        sf = _write_gini(tmp_path / "f", cust, orders)
        got = {r["c_mktsegment"]: r for r in gini_by_segment(sf).take_all()}
        cents = np.round(vals * 100).astype(np.int64)
        for seg, sel in (("A", np.arange(60) % 2 == 1), ("B", np.arange(60) % 2 == 0)):
            x = np.sort(cents[sel])
            n = len(x)
            i = np.arange(1, n + 1)
            want = (2 * int((i * x).sum()) - (n + 1) * int(x.sum())) / (n * int(x.sum()))
            assert got[seg]["gini_ppm"] == int(np.round(want * 1_000_000))
            assert got[seg]["sum_cents"] == int(x.sum())

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = gini_by_segment(sf, num_buckets=3).to_pandas()
        b = gini_by_segment(sf, num_buckets=64).to_pandas()
        assert a.equals(b)
