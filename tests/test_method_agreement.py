"""Text-vs-embedding dedup method agreement."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.dedup import dedup_method_agreement

LONG = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _write(d, texts, vecs):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestMethodAgreement:
    def test_planted_overlap(self, tmp_path):
        rng = np.random.default_rng(6)
        base = rng.normal(size=12)
        eye = np.eye(12) * 9
        # docs 0,1: dup text AND near-dup vectors -> both methods
        # docs 2,3: dup text, orthogonal vectors -> jaccard only
        # docs 4,5: distinct text, near-dup vectors -> cosine only
        other = "lambda mu nu xi omicron pi rho sigma tau upsilon"
        texts = [LONG, LONG, other, other,
                 "one two three four five six", "seven eight nine ten eleven"]
        vecs = [
            base, base + rng.normal(scale=1e-3, size=12),
            eye[0], eye[1],
            eye[2] + base * 0, eye[2] * 1.0,
        ]
        vecs[4] = eye[2] + rng.normal(scale=1e-3, size=12)
        sf = _write(tmp_path / "m", texts, vecs)
        got = dedup_method_agreement(sf).take_all()[0]
        assert got["n_both"] == 1          # (0, 1)
        assert got["jaccard_only"] == 1    # (2, 3)
        assert got["cosine_only"] == 1     # (4, 5)
        assert got["n_jaccard"] == 2 and got["n_cosine"] == 2
