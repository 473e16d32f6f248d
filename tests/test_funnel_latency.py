"""Exact funnel conversion-latency percentiles."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.analytics import funnel_latency_quantiles

T0 = dt.datetime(2024, 3, 1)


def _write_events(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(list(range(len(rows))), pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array([""] * len(rows)),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestFunnelLatency:
    def test_exact_rank_selection(self, tmp_path):
        rows = []
        # 5 users converting view->click in 1, 2, 3, 4, 5 minutes
        for u, mins in enumerate([1, 2, 3, 4, 5], start=1):
            rows.append((T0, u, "view"))
            rows.append((T0 + dt.timedelta(minutes=mins), u, "click"))
        # one of them purchases 10 minutes after the click
        rows.append((T0 + dt.timedelta(minutes=11), 1, "purchase"))
        sf = _write_events(tmp_path / "f", rows)
        got = {r["stage_pair"]: r for r in funnel_latency_quantiles(sf).take_all()}
        vc = got["view->click"]
        # k50 = ceil(2.5) = 3 -> 3 min; k90 = ceil(4.5) = 5 -> 5 min
        assert vc["n"] == 5
        assert vc["p50_us"] == 3 * 60 * 1_000_000
        assert vc["p90_us"] == 5 * 60 * 1_000_000
        cp = got["click->purchase"]
        assert cp["n"] == 1
        assert cp["p50_us"] == cp["p90_us"] == 10 * 60 * 1_000_000
        vp = got["view->purchase"]
        assert vp["p50_us"] == 11 * 60 * 1_000_000

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = funnel_latency_quantiles(sf, num_buckets=3).to_pandas()
        b = funnel_latency_quantiles(sf, num_buckets=64).to_pandas()
        assert a.equals(b)
