"""zlib compression-ratio quality histogram."""

from __future__ import annotations

import re
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import compression_hist_rows
from ocr_engine_ray.pipelines.textstats import (
    compression_ratio_digest,
    compression_ratio_hist,
)

SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["compression_ratio_digest"])
    assert len(nums) == 2
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == compression_hist_rows(SF_GATE)


def _write(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestCompressionRatio:
    def test_planted_extremes(self, tmp_path):
        repetitive = "spam " * 500           # compresses hard -> low bucket
        import random

        rng = random.Random(7)
        noisy = "".join(chr(rng.randint(0x21, 0x7E)) for _ in range(2000))
        rows = [("a", repetitive), ("a", noisy), ("a", ""), ("a", None)]
        sf = _write(tmp_path / "p", rows)
        got = {(r["source"], r["bucket"]): r["n_docs"]
               for r in compression_ratio_hist(sf).take_all()}
        rep_pct = len(zlib.compress(repetitive.encode(), 6)) * 100 // len(
            repetitive.encode()
        )
        noisy_pct = len(zlib.compress(noisy.encode(), 6)) * 100 // len(
            noisy.encode()
        )
        assert got == {
            ("a", min(rep_pct, 119) // 10): 1,
            ("a", min(noisy_pct, 119) // 10): 1,
        }
        assert rep_pct // 10 < noisy_pct // 10  # the signal separates them

    def test_engine_matches_sequential_twin(self, tmp_path):
        rows = [("s%d" % (i % 3), ("word%d " % i) * (10 + i)) for i in range(40)]
        sf = _write(tmp_path / "m", rows)
        t = compression_ratio_digest(sf)
        eng = (t.column("n_rows")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == compression_hist_rows(sf)
