"""Group-aware (leakage-safe) train/val/test split."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.sampling import leakage_safe_split


def _write_embeddings(d, vecs):
    d.mkdir(parents=True)
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


def _coin(rep: int) -> float:
    return (int(hashlib.md5(f"{rep}:g".encode()).hexdigest()[:8], 16) + 1) / 4294967297.0


def _split_of(u: float) -> str:
    return "train" if u < 0.9 else ("val" if u < 0.95 else "test")


@pytest.mark.usefixtures("ray_session")
class TestLeakageSafeSplit:
    def test_clusters_never_straddle(self, tmp_path):
        rng = np.random.default_rng(7)
        base = rng.normal(size=(4, 16))
        vecs = []
        # ids 0-2 ≈ base0, ids 3-4 ≈ base1, 5.. singletons (orthogonal-ish)
        for i in range(3):
            vecs.append(base[0] + rng.normal(scale=1e-3, size=16))
        for i in range(2):
            vecs.append(base[1] + rng.normal(scale=1e-3, size=16))
        eye = np.eye(16)
        for i in range(6):
            vecs.append(eye[i] * 10.0)
        sf = _write_embeddings(tmp_path / "e", vecs)
        got = {r["vec_id"]: r for r in leakage_safe_split(sf).take_all()}
        assert len(got) == len(vecs)
        # cluster members share rep and split
        assert {got[i]["rep_id"] for i in (0, 1, 2)} == {0}
        assert {got[i]["rep_id"] for i in (3, 4)} == {3}
        assert len({got[i]["split"] for i in (0, 1, 2)}) == 1
        assert len({got[i]["split"] for i in (3, 4)}) == 1
        # singletons: rep = self, coin on own id
        for i in range(5, len(vecs)):
            assert got[i]["rep_id"] == i
            assert got[i]["split"] == _split_of(_coin(i))
        # cluster coin thrown on the representative
        assert got[0]["split"] == _split_of(_coin(0))
        assert got[3]["split"] == _split_of(_coin(3))

    def test_bucket_invariance_and_purity_on_sf(self):
        sf = "/root/testdata/sf0.001"
        a = leakage_safe_split(sf, num_buckets=3).to_pandas()
        b = leakage_safe_split(sf, num_buckets=32).to_pandas()
        assert a.equals(b)
        # by construction: one split per rep group
        assert (a.groupby("rep_id")["split"].nunique() == 1).all()

    def test_fraction_boundaries(self, tmp_path):
        eye = np.eye(8)
        sf = _write_embeddings(tmp_path / "f", [eye[i] * 5 for i in range(8)])
        got = leakage_safe_split(sf, val_frac=0.0, test_frac=1.0).take_all()
        assert {r["split"] for r in got} == {"test"}
        got = leakage_safe_split(sf, val_frac=0.0, test_frac=0.0).take_all()
        assert {r["split"] for r in got} == {"train"}
