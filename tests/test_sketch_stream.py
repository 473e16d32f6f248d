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
    @pytest.mark.parametrize("path", ["distributed", "actors"])
    def test_running_totals(self, path):
        import duckdb

        from ocr_engine_ray.state.stream import (
            stream_running_totals,
            stream_running_totals_actors,
        )

        if path == "distributed":
            t = stream_running_totals(SF, num_buckets=4)
        else:
            t = stream_running_totals_actors(SF, num_buckets=4, batch_rows=128)
        df = t.to_pandas().sort_values(["ts", "event_id"])
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

    def test_paths_agree(self):
        """The distributed bucket-cumsum path and the actor-fleet streaming
        path compute byte-identical running totals."""
        from ocr_engine_ray.state.stream import (
            stream_running_totals,
            stream_running_totals_actors,
        )

        cols = ["event_id", "user_id", "running_n", "running_cents"]
        a = (
            stream_running_totals(SF, num_buckets=3)
            .to_pandas()
            .sort_values("event_id")[cols]
            .reset_index(drop=True)
        )
        b = (
            stream_running_totals_actors(SF, num_buckets=2, batch_rows=77)
            .to_pandas()
            .sort_values("event_id")[cols]
            .reset_index(drop=True)
        )
        assert a.equals(b)

    def test_actor_carry_across_batches(self):
        """KeyedCounterActor's vectorized in-batch cumsum + per-key carry is
        exact across arbitrary batch splits."""
        import pyarrow as pa
        import ray

        from ocr_engine_ray.state.stream import KeyedCounterActor

        actor = KeyedCounterActor.remote()
        rows = [(7, 1.0), (8, 2.0), (7, 0.5), (7, -1.25), (8, 0.0), (9, 3.0)]
        outs = []
        # feed as uneven batches: [2, 1, 3]
        for lo, hi in [(0, 2), (2, 3), (3, 6)]:
            batch = pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows[lo:hi]], pa.int64()),
                    "value": pa.array([r[1] for r in rows[lo:hi]], pa.float64()),
                }
            )
            outs.append(ray.get(actor.ingest.remote(batch)))
        got = pa.concat_tables(outs)
        assert got.column("running_n").to_pylist() == [1, 1, 2, 3, 2, 1]
        assert got.column("running_cents").to_pylist() == [
            100, 200, 150, 25, 200, 300,
        ]
        assert ray.get(actor.state_size.remote()) == 3
