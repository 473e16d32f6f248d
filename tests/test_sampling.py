"""Sampling + shuffled-export operators."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.sampling import (
    shuffled_shard_export,
    stratified_hash_sample,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestSampling:
    def test_stratified_sample_shape_and_determinism(self):
        a = sorted(
            (r["source"], r["doc_id"]) for r in stratified_hash_sample(SF).take_all()
        )
        b = sorted(
            (r["source"], r["doc_id"]) for r in stratified_hash_sample(SF).take_all()
        )
        assert a == b
        per_source: dict[str, int] = {}
        for s, _ in a:
            per_source[s] = per_source.get(s, 0) + 1
        assert all(v == 5 for v in per_source.values())
        assert len(per_source) == 20

    def test_shuffled_export_coverage_and_determinism(self, tmp_path):
        out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
        r1 = shuffled_shard_export(SF, out1, seed=7, num_shards=4)
        r2 = shuffled_shard_export(SF, out2, seed=7, num_shards=4)
        assert r1["rows"] == 500 and r1["shards"] >= 1
        t1 = pq.read_table(out1).sort_by("doc_id")
        t2 = pq.read_table(out2).sort_by("doc_id")
        # exactly-once coverage
        assert t1.column("doc_id").to_pylist() == sorted(range(500))
        # same seed ⇒ identical contents
        assert t1.equals(t2)
        # genuinely shuffled (not in doc_id order on disk)
        raw = pq.read_table(out1).column("doc_id").to_pylist()
        assert raw != sorted(raw)


@pytest.mark.usefixtures("ray_session")
class TestTokenBudgetSample:
    def test_budget_monotone_prefix(self):
        """A larger budget's per-source selection extends the smaller one
        (same deterministic hash order), and every selection respects its
        budget."""
        from ocr_engine_ray.pipelines.sampling import token_budget_sample

        sf = "/root/testdata/sf0.001"
        small = token_budget_sample(sf, budget_tokens=300).to_pandas()
        large = token_budget_sample(sf, budget_tokens=900).to_pandas()
        assert (small["cum_tokens"] <= 300).all()
        assert (large["cum_tokens"] <= 900).all()
        small_ids = set(small["doc_id"])
        assert small_ids <= set(large["doc_id"])
        # within a source, the small selection is exactly the prefix of the
        # large one up to the smaller budget
        for src, g in large.groupby("source"):
            want = set(g[g["cum_tokens"] <= 300]["doc_id"])
            got = set(small[small["source"] == src]["doc_id"])
            assert got == want, src

    def test_bucket_invariance(self):
        """The two-pass prefix sum is exact for ANY range-bucket count —
        num_buckets is a pure parallelism knob, never a semantics knob."""
        from ocr_engine_ray.pipelines.sampling import token_budget_sample

        sf = "/root/testdata/sf0.001"
        frames = [
            token_budget_sample(sf, budget_tokens=700, num_buckets=b)
            .to_pandas()
            .sort_values(["source", "doc_id"])
            .reset_index(drop=True)
            for b in (1, 7, 64)
        ]
        assert len(frames[0]) > 0
        for f in frames[1:]:
            assert f.equals(frames[0])


class TestWeightedSample:
    def test_deterministic_and_sized(self, ray_session):
        from ocr_engine_ray.pipelines.sampling import weighted_sample

        sf = "/root/testdata/sf0.01"
        a = weighted_sample(sf, n=50).take_all()
        b = weighted_sample(sf, n=50).take_all()
        assert a == b and len(a) == 50

    def test_weights_bias_selection(self, ray_session, tmp_path):
        """Heavy docs (many tokens) must be overrepresented vs light ones."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines.sampling import weighted_sample

        rows = []
        for i in range(400):
            heavy = i < 200
            rows.append(
                {
                    "doc_id": i,
                    "text": " ".join(["w"] * (200 if heavy else 2)),
                    "lang": "en",
                    "source": "heavy" if heavy else "light",
                    "n_chars": 0,
                }
            )
        d = tmp_path / "c"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = weighted_sample(str(d), n=100).take_all()
        n_heavy = sum(1 for r in got if r["source"] == "heavy")
        # E-S with w=201 vs w=3: heavy docs dominate the top keys
        assert n_heavy > 75


class TestTemperatureRebalance:
    def test_smallest_source_kept_entirely(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines.sampling import temperature_rebalance

        rows = []
        for i in range(330):
            big = i < 300
            rows.append(
                {
                    "doc_id": i,
                    "text": "tok " * 10,
                    "lang": "en",
                    "source": "big" if big else "small",
                    "n_chars": 0,
                }
            )
        d = tmp_path / "c"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = temperature_rebalance(str(d), alpha=0.5).take_all()
        kept = {"big": 0, "small": 0}
        for r in got:
            kept[r["source"]] += 1
        assert kept["small"] == 30  # p = 1 for the smallest source
        # big keeps ~ (10x tokens)^(-0.5) ≈ 31.6% of 300 ≈ 95 (hash coin)
        assert 60 < kept["big"] < 135

    def test_alpha_one_keeps_everything(self, ray_session):
        from ocr_engine_ray.pipelines.sampling import temperature_rebalance

        got = temperature_rebalance("/root/testdata/sf0.01", alpha=1.0).take_all()
        assert len(got) == 500

    def test_zero_token_source_keeps_all_and_matches_sql(
        self, ray_session, tmp_path
    ):
        """A source whose every doc is whitespace-only has token mass 0:
        it must keep everything (not crash on w_s/w_min) and the SQL twin
        must agree row-for-row (regression: ZeroDivisionError on the Ray
        side vs NULL-division row-drop in DuckDB)."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines.sampling import temperature_rebalance

        rows = []
        for i in range(40):
            rows.append(
                {
                    "doc_id": i,
                    "text": "   \t " if i < 10 else "tok " * 5,
                    "lang": "en",
                    "source": "empty" if i < 10 else "full",
                    "n_chars": 0,
                }
            )
        d = tmp_path / "z"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = sorted(
            (r["doc_id"], r["source"])
            for r in temperature_rebalance(str(d), alpha=0.5).take_all()
        )
        assert [g for g in got if g[1] == "empty"] == [(i, "empty") for i in range(10)]

        import __ray_entry__ as entry

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = sorted(
            (int(r[0]), r[1])
            for r in con.execute(
                entry.oracle_sql()["temperature_rebalance"]
            ).fetchall()
        )
        assert got == want


class TestHashSplit:
    def test_fractions_and_determinism(self, ray_session):
        from ocr_engine_ray.pipelines.sampling import hash_split

        got = hash_split("/root/testdata/sf0.01").take_all()
        assert len(got) == 500
        counts = {"train": 0, "val": 0, "test": 0}
        for r in got:
            counts[r["split"]] += 1
        # 500 docs at 90/5/5: generous binomial bands
        assert 420 <= counts["train"] <= 480
        assert 5 <= counts["val"] <= 55
        assert 5 <= counts["test"] <= 55
        again = hash_split("/root/testdata/sf0.01").take_all()
        assert got == again

    def test_split_stable_across_corpus_subsets(self, ray_session, tmp_path):
        """Removing documents never moves a surviving doc across splits
        (the decontamination-stability property)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines.sampling import hash_split

        full = {
            r["doc_id"]: r["split"]
            for r in hash_split("/root/testdata/sf0.01").take_all()
        }
        t = pq.read_table("/root/testdata/sf0.01/documents.parquet")
        half = t.slice(0, 250)
        d = tmp_path / "h"
        d.mkdir()
        pq.write_table(half, str(d / "documents.parquet"))
        for r in hash_split(str(d)).take_all():
            assert full[r["doc_id"]] == r["split"]
