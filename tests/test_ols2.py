"""Two-feature closed-form regression via exact integer Cramer's rule."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.profile import ols2_chars_fit


def _write_docs(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "text": pa.array([r[0] for r in rows], pa.string()),
                "n_chars": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def _doc(n_tok, n_vowel):
    """n_tok tokens of which n_vowel contain one vowel group each."""
    assert n_vowel <= n_tok
    words = ["ba"] * n_vowel + ["bc"] * (n_tok - n_vowel)
    return " ".join(words)


@pytest.mark.usefixtures("ray_session")
class TestOLS2:
    def test_exact_plane(self, tmp_path):
        # y = 7*x1 + 3*x2 + 11 exactly, over a non-degenerate design
        rng = np.random.default_rng(3)
        rows = []
        for _ in range(60):
            x1 = int(rng.integers(2, 40))
            x2 = int(rng.integers(0, x1 + 1))
            rows.append((_doc(x1, x2), 7 * x1 + 3 * x2 + 11))
        sf = _write_docs(tmp_path / "p", rows)
        r = ols2_chars_fit(sf).take_all()[0]
        assert r["b0_ppm"] == 11_000_000
        assert r["b1_ppm"] == 7_000_000
        assert r["b2_ppm"] == 3_000_000

    def test_matches_numpy_lstsq(self, tmp_path):
        rng = np.random.default_rng(5)
        rows, X, Y = [], [], []
        for _ in range(200):
            x1 = int(rng.integers(2, 60))
            x2 = int(rng.integers(0, x1 + 1))
            y = int(5 * x1 + 2 * x2 + rng.integers(-10, 11))
            rows.append((_doc(x1, x2), y))
            X.append([1.0, x1, x2])
            Y.append(float(y))
        sf = _write_docs(tmp_path / "n", rows)
        r = ols2_chars_fit(sf).take_all()[0]
        beta, *_ = np.linalg.lstsq(np.array(X), np.array(Y), rcond=None)
        assert abs(r["b0_ppm"] / 1e6 - beta[0]) < 1e-4
        assert abs(r["b1_ppm"] / 1e6 - beta[1]) < 1e-5
        assert abs(r["b2_ppm"] / 1e6 - beta[2]) < 1e-5

    def test_degenerate_design_zero(self, tmp_path):
        # x2 == x1 for every doc -> singular normal matrix -> all zeros
        rows = [(_doc(k, k), 4 * k) for k in range(1, 20)]
        sf = _write_docs(tmp_path / "d", rows)
        r = ols2_chars_fit(sf).take_all()[0]
        assert (r["b0_ppm"], r["b1_ppm"], r["b2_ppm"]) == (0, 0, 0)

    def test_chunk_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = ols2_chars_fit(sf, chunk=64).to_pandas()
        b = ols2_chars_fit(sf, chunk=8192).to_pandas()
        assert a.equals(b)
