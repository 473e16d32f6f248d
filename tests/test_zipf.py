"""Zipf rank-frequency slope fit."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.textstats import zipf_slope_by_source


def _write_docs(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(rows))), pa.int64()),
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestZipfSlope:
    def test_planted_power_law(self, tmp_path):
        # counts c(r) = 64 >> (r-1th power) i.e. c = 64/2^(r-1) -> pure
        # power law with slope ln(1/2)/ln(2)... construct exactly c = K/r:
        # tokens w1..w8 with counts 840/r (integers for r=1..8)
        words = []
        K = 840
        for r in range(1, 9):
            words += [f"w{r:02d}"] * (K // r)
        text = " ".join(words)
        sf = _write_docs(tmp_path / "z", [("s", text)])
        got = zipf_slope_by_source(sf).take_all()[0]
        assert got["vocab"] == 8
        # exact power law c = K/r has slope −1 (up to integer truncation of
        # counts and grid quantization)
        assert abs(got["zipf_slope_ppm"] / 1e6 + 1.0) < 0.01

    def test_uniform_counts_slope_zero(self, tmp_path):
        text = " ".join([f"t{i}" for i in range(12)] * 5)  # every count = 5
        sf = _write_docs(tmp_path / "u", [("s", text)])
        got = zipf_slope_by_source(sf).take_all()[0]
        assert got["zipf_slope_ppm"] == 0

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = zipf_slope_by_source(sf, num_buckets=3).to_pandas()
        b = zipf_slope_by_source(sf, num_buckets=64).to_pandas()
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestHapaxRate:
    def test_hand_computed(self, tmp_path):
        import pyarrow.parquet as _pq

        from ocr_engine_ray.pipelines.textstats import hapax_rate_by_source

        d = tmp_path / "h"
        d.mkdir(parents=True, exist_ok=True)
        _pq.write_table(
            pa.table(
                {
                    "source": pa.array(["s1", "s1", "s2"], pa.string()),
                    # s1: 'a' twice, 'b' once, 'c' once -> 3 distinct, 2 hapax
                    # s2: 'a' once -> 1 distinct, 1 hapax (cross-source
                    # occurrences do NOT merge)
                    "text": pa.array(["a b", "a c", "a"], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        got = {r["source"]: r for r in hapax_rate_by_source(str(d)).take_all()}
        assert got["s1"]["n_distinct_tokens"] == 3
        assert got["s1"]["n_hapax"] == 2
        assert got["s1"]["hapax_ppm"] == 2 * 1_000_000 // 3
        assert got["s2"]["n_hapax"] == 1
        assert got["s2"]["hapax_ppm"] == 1_000_000
