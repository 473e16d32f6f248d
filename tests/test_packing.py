"""Tests for pack_sequences: the two-pass distributed prefix sum must equal
a sequential cumsum regardless of bucket count, including single-source
corpora that span many buckets (the cross-bucket offset path)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines import packing


def _write(tmp_path, n_docs: int, n_sources: int) -> tuple[str, list[dict]]:
    rng = np.random.default_rng(11)
    rows = []
    for i in range(n_docs):
        nwords = int(rng.integers(1, 40))
        rows.append(
            {
                "doc_id": i * 7 + 3,  # non-contiguous ids
                "text": " ".join(f"w{j}" for j in range(nwords)),
                "lang": "en",
                "source": f"s{i % n_sources}",
                "n_chars": 0,
            }
        )
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d), rows


def _expected(rows: list[dict], budget: int) -> dict[int, tuple[int, int]]:
    acc: dict[str, int] = {}
    out = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        n = len(r["text"].split())
        off = acc.get(r["source"], 0)
        out[r["doc_id"]] = (off, off // budget)
        acc[r["source"]] = off + n
    return out


class TestPackSequences:
    def test_matches_sequential_cumsum_multi_bucket(self, ray_session, tmp_path):
        sf, rows = _write(tmp_path, 200, 3)
        got = packing.pack_sequences(sf, budget=100, num_buckets=16).take_all()
        want = _expected(rows, 100)
        assert len(got) == 200
        for g in got:
            off, seq = want[g["doc_id"]]
            assert (g["tok_offset"], g["seq_id"]) == (off, seq), g["doc_id"]

    def test_single_source_spans_buckets(self, ray_session, tmp_path):
        sf, rows = _write(tmp_path, 150, 1)
        got = packing.pack_sequences(sf, budget=64, num_buckets=32).take_all()
        want = _expected(rows, 64)
        for g in got:
            assert (g["tok_offset"], g["seq_id"]) == want[g["doc_id"]]
        # offsets strictly increase in doc_id order within the one source
        offs = [g["tok_offset"] for g in got]
        assert offs == sorted(offs)

    def test_bucket_count_invariance(self, ray_session, tmp_path):
        sf, _ = _write(tmp_path, 80, 4)
        a = packing.pack_sequences(sf, budget=50, num_buckets=1).take_all()
        b = packing.pack_sequences(sf, budget=50, num_buckets=64).take_all()
        assert a == b


class TestRankByQuality:
    def test_matches_sequential_ranking(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.functions.textstats import quality_score

        rng = np.random.default_rng(5)
        rows = [
            {
                "doc_id": i,
                "text": " ".join(
                    rng.choice(["the", "alpha", "beta", "12", "!!"], size=int(rng.integers(1, 30)))
                ),
                "lang": "en",
                "source": f"s{i % 3}",
                "n_chars": 0,
            }
            for i in range(150)
        ]
        d = tmp_path / "c"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = packing.rank_by_quality(str(d), num_buckets=16).take_all()
        # sequential expectation
        per_src: dict[str, list] = {}
        for r in rows:
            per_src.setdefault(r["source"], []).append(
                (quality_score(r["text"]), r["doc_id"])
            )
        want = {}
        for src, lst in per_src.items():
            for rank, (_, did) in enumerate(sorted(lst), start=1):
                want[did] = rank
        for g in got:
            assert g["rank_in_source"] == want[g["doc_id"]], g["doc_id"]

    def test_bucket_count_invariance(self, ray_session):
        sf = "/root/testdata/sf0.01"
        a = packing.rank_by_quality(sf, num_buckets=1).take_all()
        b = packing.rank_by_quality(sf, num_buckets=256).take_all()
        assert a == b


class TestEmptyCorpusPaths:
    def _empty(self, tmp_path) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path / "empty"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                    "lang": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                    "n_chars": pa.array([], pa.int64()),
                }
            ),
            str(d / "documents.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "l_linestatus": pa.array([], pa.string()),
                    "l_extendedprice": pa.array([], pa.float64()),
                    "l_discount": pa.array([], pa.float64()),
                }
            ),
            str(d / "lineitem.parquet"),
        )
        return str(d)

    def test_empty_inputs_match_sql_semantics(self, ray_session, tmp_path):
        from ocr_engine_ray.pipelines import analytics, sampling

        sf = self._empty(tmp_path)
        assert packing.pack_sequences(sf).take_all() == []
        assert packing.rank_by_quality(sf).take_all() == []
        assert sampling.temperature_rebalance(sf).take_all() == []
        # SQL ROLLUP over an empty table still emits the grand-total set
        (row,) = analytics.rollup_pricing(sf).take_all()
        assert row == {
            "l_returnflag": None,
            "l_linestatus": None,
            "sum_disc_price": None,
            "n_items": 0,
        }


class TestChunkTokenWindows:
    def test_boundaries(self, ray_session, tmp_path):
        """0-token doc -> no chunks; n < window -> one short chunk; exact
        stride multiples -> tail chunk of window-stride tokens."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines.packing import chunk_token_windows

        rows = [
            {"doc_id": 0, "text": "   ", "lang": "en", "source": "s", "n_chars": 0},
            {"doc_id": 1, "text": "a b c", "lang": "en", "source": "s", "n_chars": 0},
            # 96 tokens = 2*stride at stride 48: chunks at 0 (64 toks) and 48 (48 toks)
            {"doc_id": 2, "text": " ".join(f"t{i}" for i in range(96)),
             "lang": "en", "source": "s", "n_chars": 0},
        ]
        d = tmp_path / "c"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = chunk_token_windows(str(d)).take_all()
        by_doc = {}
        for r in got:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert 0 not in by_doc
        assert [r["n_tok_chunk"] for r in by_doc[1]] == [3]
        assert by_doc[1][0]["chunk_text"] == "a b c"
        assert [(r["tok_start"], r["n_tok_chunk"]) for r in by_doc[2]] == [
            (0, 64),
            (48, 48),
        ]
        # overlap: chunk 1 starts at token 48
        assert by_doc[2][1]["chunk_text"].split(" ")[0] == "t48"

    def test_coverage_and_overlap_invariant(self, ray_session):
        """Every token index of every doc is covered by >=1 chunk and chunk
        starts advance by exactly the stride."""
        from ocr_engine_ray.pipelines.packing import chunk_token_windows

        got = chunk_token_windows("/root/testdata/sf0.01").take_all()
        per_doc = {}
        for r in got:
            per_doc.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["tok_start"], r["n_tok_chunk"])
            )
        for chunks in per_doc.values():
            chunks.sort()
            covered_to = 0
            for k, (cid, s, m) in enumerate(chunks):
                assert cid == k and s == k * 48 and m >= 1
                assert s <= covered_to  # no gap
                covered_to = max(covered_to, s + m)


class TestTopQualityFraction:
    def test_keep_rate_per_source(self, ray_session):
        from ray.data.aggregate import Count

        from ocr_engine_ray.pipelines.packing import (
            rank_by_quality,
            top_quality_fraction,
        )

        ranked = rank_by_quality("/root/testdata/sf0.01")
        totals = {
            r["source"]: r["n"]
            for r in ranked.groupby("source").aggregate(Count(alias_name="n")).take_all()
        }
        kept = top_quality_fraction("/root/testdata/sf0.01").take_all()
        per_src: dict = {}
        for r in kept:
            per_src[r["source"]] = per_src.get(r["source"], 0) + 1
        for s, n in totals.items():
            assert per_src.get(s, 0) == (n * 25) // 100, s
        # kept docs are exactly the top ranks of each source
        for r in kept:
            assert r["rank_in_source"] > totals[r["source"]] - (
                totals[r["source"]] * 25
            ) // 100


@pytest.mark.usefixtures("ray_session")
class TestLengthBucketPadding:
    def _write(self, d, texts):
        import pyarrow.parquet as _pq

        d.mkdir(parents=True, exist_ok=True)
        _pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        return str(d)

    def test_hand_computed(self, tmp_path):
        from ocr_engine_ray.pipelines.packing import length_bucket_padding

        # token counts 1, 100, 2, 101 at batch_size=2:
        # sorted  -> (1,2), (100,101): padding = 1 + 1 = 2
        # natural -> (1,100), (2,101): padding = 99 + 99 = 198
        texts = ["a", "w " * 99 + "w", "a b", "w " * 100 + "w"]
        sf = self._write(tmp_path / "p", texts)
        got = length_bucket_padding(sf, batch_size=2).take_all()[0]
        assert got["n_docs"] == 4
        assert got["n_batches"] == 2
        assert got["total_tokens"] == 204
        assert got["padding_sorted"] == 2
        assert got["padding_natural"] == 198
        assert got["saved_ppm"] == (198 - 2) * 1_000_000 // 198

    def test_uniform_lengths_no_padding(self, tmp_path):
        from ocr_engine_ray.pipelines.packing import length_bucket_padding

        sf = self._write(tmp_path / "u", ["a b c"] * 6)
        got = length_bucket_padding(sf, batch_size=3).take_all()[0]
        assert got["padding_sorted"] == 0
        assert got["padding_natural"] == 0
        assert got["saved_ppm"] == 0
