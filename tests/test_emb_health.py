"""Vector-column health audit."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.diagnostics import embedding_health


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingHealth:
    def test_planted_defects(self, tmp_path):
        d = tmp_path / "h"
        d.mkdir()
        good = [1.0, -2.0, 0.5, 3.0]
        rows = [
            good,                     # healthy
            None,                     # null vector
            [1.0, 2.0],               # wrong dim
            [float("nan"), 0.0, 0.0, 0.0],   # NaN
            [float("inf"), 0.0, 0.0, 0.0],   # Inf
            [0.0, 0.0, 0.0, 0.0],     # zero norm
        ]
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(list(range(len(rows))), pa.int64()),
                    "embedding": pa.array(rows, pa.list_(pa.float32())),
                    "label": pa.array([0] * len(rows), pa.int32()),
                }
            ),
            str(d / "embeddings.parquet"),
        )
        got = embedding_health(str(d), expected_dim=4).take_all()[0]
        assert got == {
            "n_rows": 6,
            "n_null": 1,
            "n_wrong_dim": 1,
            "n_nonfinite": 2,
            "n_zero_norm": 1,
            "dim_expected": 4,
        }

    def test_clean_corpus(self):
        got = embedding_health("/root/testdata/sf0.001").take_all()[0]
        assert got["n_rows"] == 500
        assert (
            got["n_null"]
            == got["n_wrong_dim"]
            == got["n_nonfinite"]
            == got["n_zero_norm"]
            == 0
        )
