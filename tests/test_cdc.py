"""Content-defined chunking dedup stats."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import cdc_rows
from ocr_engine_ray.pipelines.dedup import cdc_cut_points, cdc_dedup_stats, cdc_digest

SF = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["cdc_digest"])
    assert len(nums) == 2
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == cdc_rows(SF_GATE)


def test_cut_points_match_sequential_recurrence():
    """The 64-shifted-add vectorization equals the byte-at-a-time gear
    recurrence h = (h<<1 + gear[b]) mod 2^64 on adversarial lengths."""
    import hashlib

    gear = [
        int.from_bytes(hashlib.md5(bytes([b])).digest()[:8], "big")
        for b in range(256)
    ]

    def seq_cuts(data: bytes, mask_bits=6):
        h, cuts, mask = 0, [], (1 << mask_bits) - 1
        for i, byte in enumerate(data):
            h = ((h << 1) + gear[byte]) & ((1 << 64) - 1)
            if (h & mask) == 0:
                cuts.append(i + 1)
        if data and (not cuts or cuts[-1] != len(data)):
            cuts.append(len(data))
        return cuts

    import random

    rng = random.Random(11)
    samples = [b"", b"a", b"ab" * 40, bytes(range(256)) * 3]
    samples += [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 300)))
        for _ in range(50)
    ]
    for data in samples:
        assert cdc_cut_points(data).tolist() == seq_cuts(data), data[:20]


def test_insertion_robustness():
    """Inserting bytes early changes only boundary-local chunks: most cut
    points after the edit realign (the CDC property fixed-size blocks
    lack)."""
    base = bytes(i % 251 for i in range(4000))
    edited = base[:100] + b"INSERTED" + base[100:]
    a = set(cdc_cut_points(base).tolist())
    b = {c - 8 for c in cdc_cut_points(edited).tolist() if c > 108 + 64}
    # every post-edit boundary beyond the 64-byte window realigns exactly
    realigned = {c for c in a if c > 108 + 64}
    assert realigned and realigned <= b


@pytest.mark.usefixtures("ray_session")
class TestCDC:
    def test_engine_matches_sequential_oracle(self):
        t = cdc_digest(SF)
        eng = (t.column("n_rows")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == cdc_rows(SF)

    def test_duplicated_docs_dedup_fully(self, tmp_path):
        d = tmp_path / "dup"
        d.mkdir()
        body = "shared paragraph content " * 40
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(4), pa.int64()),
                    "source": pa.array(["s"] * 4, pa.string()),
                    "text": pa.array([body] * 4, pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        r = cdc_dedup_stats(str(d)).take_all()[0]
        # four identical docs: unique bytes ≈ 1/4 of total
        assert r["bytes_unique"] * 4 == r["bytes_total"]
        assert r["dedup_ratio_ppm"] == 750_000
