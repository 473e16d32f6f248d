"""Per-source OLS regression from exact integer sufficient statistics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.profile import ols_chars_per_token


def _write_docs(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "n_chars": pa.array([r[2] for r in rows], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestOLS:
    def test_exact_line(self, tmp_path):
        # n_chars = 6 * tokens + 2 exactly -> slope 6.0, intercept 2.0
        rows = [("A", " ".join(["w"] * k), 6 * k + 2) for k in range(1, 30)]
        # degenerate source: constant x -> denominator 0 -> (0, 0)
        rows += [("B", "a b c", v) for v in (10, 20, 30)]
        sf = _write_docs(tmp_path / "d", rows)
        got = {r["source"]: r for r in ols_chars_per_token(sf).take_all()}
        assert got["A"]["slope_ppm"] == 6_000_000
        assert got["A"]["intercept_ppm"] == 2_000_000
        assert got["B"]["slope_ppm"] == 0 and got["B"]["intercept_ppm"] == 0

    def test_matches_numpy_polyfit(self, tmp_path):
        rng = np.random.default_rng(11)
        ks = rng.integers(1, 60, size=300)
        ys = (ks * 5.3 + rng.normal(scale=9, size=300)).round().astype(int)
        rows = [("A", " ".join(["t"] * int(k)), int(y)) for k, y in zip(ks, ys)]
        sf = _write_docs(tmp_path / "n", rows)
        got = ols_chars_per_token(sf).take_all()[0]
        slope, intercept = np.polyfit(ks.astype(float), ys.astype(float), 1)
        assert abs(got["slope_ppm"] / 1e6 - slope) < 1e-5
        assert abs(got["intercept_ppm"] / 1e6 - intercept) < 1e-4

    def test_chunk_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = ols_chars_per_token(sf, chunk=64).to_pandas()
        b = ols_chars_per_token(sf, chunk=8192).to_pandas()
        assert a.equals(b)
