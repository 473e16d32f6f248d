"""Per-source unigram Shannon entropy on the q20 ln grid."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.textstats import token_entropy_by_source


def _write_docs(d, rows):
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
class TestEntropy:
    def test_uniform_and_degenerate(self, tmp_path):
        rows = [
            ("uni", "a b c d"),            # 4 distinct, uniform -> H = ln 4
            ("one", "x x x x x"),          # single token -> H = 0
        ]
        sf = _write_docs(tmp_path / "u", rows)
        got = {r["source"]: r for r in token_entropy_by_source(sf).take_all()}
        assert got["uni"]["entropy_ppm"] == int(np.round(np.log(4.0) * 1e6))
        assert got["one"]["entropy_ppm"] == 0
        assert got["one"]["n_tokens"] == 5 and got["one"]["n_distinct_tokens"] == 1

    def test_matches_scipy_style_formula(self, tmp_path):
        # skewed counts: 8×a, 4×b, 2×c, 1×d, 1×e
        text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d", "e"])
        sf = _write_docs(tmp_path / "s", [("A", text)])
        r = token_entropy_by_source(sf).take_all()[0]
        p = np.array([8, 4, 2, 1, 1]) / 16.0
        want = -np.sum(p * np.log(p))
        assert abs(r["entropy_ppm"] / 1e6 - want) < 1e-4  # grid quantization

    def test_bucket_invariance(self):
        sf = "/root/testdata/sf0.001"
        a = token_entropy_by_source(sf, num_buckets=7).to_pandas()
        b = token_entropy_by_source(sf, num_buckets=64).to_pandas()
        assert a.equals(b)
