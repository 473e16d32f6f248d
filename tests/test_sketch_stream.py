"""HLL sketch + stateful streaming actor tests."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_engine_ray.functions import sketch

SF = "/root/testdata/sf0.001"


class TestHLL:
    def test_accuracy(self):
        vals = [f"value-{i}" for i in range(10_000)]
        est = sketch.hll_estimate(sketch.hll_sketch(vals))
        assert abs(est - 10_000) / 10_000 < 0.05

    def test_duplicates_dont_count(self):
        est = sketch.hll_estimate(sketch.hll_sketch(["a", "b", "a", "b"] * 100))
        assert 1 <= est <= 4

    def test_merge_is_union(self):
        a = sketch.hll_sketch([f"x{i}" for i in range(500)])
        b = sketch.hll_sketch([f"x{i}" for i in range(250, 750)])
        merged = sketch.hll_estimate(sketch.hll_merge([a, b]))
        assert abs(merged - 750) / 750 < 0.06

    def test_empty(self):
        assert sketch.hll_estimate(sketch.hll_sketch([])) == 0.0


@pytest.mark.usefixtures("ray_session")
class TestApproxDistinct:
    def test_matches_exact_within_error(self):
        import duckdb

        from ocr_engine_ray.pipelines.textstats import approx_distinct_texts

        got = {
            r["source"]: r["approx_unique"]
            for r in approx_distinct_texts(SF).take_all()
        }
        exact = dict(
            duckdb.connect()
            .execute(
                f"SELECT source, count(DISTINCT text) FROM "
                f"read_parquet('{SF}/documents.parquet') GROUP BY 1"
            )
            .fetchall()
        )
        assert set(got) == set(exact)
        for s, e in exact.items():
            assert abs(got[s] - e) / max(e, 1) < 0.15, (s, got[s], e)


@pytest.mark.usefixtures("ray_session")
class TestStatefulStream:
    def test_running_totals(self):
        import duckdb

        from ocr_engine_ray.state.stream import stream_running_totals

        t = stream_running_totals(SF, num_buckets=4, batch_rows=128)
        df = t.to_pandas()
        assert len(df) == 1000
        final = df.groupby("user_id")["running_n"].max()
        exact = dict(
            duckdb.connect()
            .execute(
                f"SELECT user_id, count(*) FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
            )
            .fetchall()
        )
        for u, n in exact.items():
            assert final[u] == n, u
        # per-user monotonic increments of exactly 1 in ts order
        for _, g in df.groupby("user_id"):
            rn = g["running_n"].to_numpy()
            assert (np.diff(rn) == 1).all()
            assert rn[0] == 1
