"""Class-balanced deterministic downsample."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.sampling import balanced_label_sample


def _write(d, labels):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(range(len(labels))), pa.int64()),
                "embedding": pa.array([[0.0]] * len(labels), pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestBalancedLabelSample:
    def test_every_label_keeps_n_min(self, tmp_path):
        labels = [0] * 20 + [1] * 7 + [2] * 13
        sf = _write(tmp_path / "b", labels)
        got = balanced_label_sample(sf).take_all()
        by_label = {}
        for r in got:
            by_label.setdefault(r["label"], []).append(r["vec_id"])
        assert {k: len(v) for k, v in by_label.items()} == {0: 7, 1: 7, 2: 7}
        # rarest class kept whole
        assert sorted(by_label[1]) == list(range(20, 27))
        # majority class kept by coin order
        coins = sorted(
            (hashlib.md5(f"{v}:b".encode()).hexdigest(), v) for v in range(20)
        )
        assert sorted(by_label[0]) == sorted(v for _, v in coins[:7])

    def test_subset_stability_under_growth(self, tmp_path):
        # adding rows to the MAJORITY class never changes which minority
        # rows are kept (coin is a pure function of vec_id)
        a = balanced_label_sample(_write(tmp_path / "a", [0] * 10 + [1] * 5)).take_all()
        b = balanced_label_sample(_write(tmp_path / "c", [0] * 30 + [1] * 5)).take_all()
        kept_minority_a = sorted(r["vec_id"] for r in a if r["label"] == 1)
        kept_minority_b = sorted(r["vec_id"] for r in b if r["label"] == 1)
        assert kept_minority_a == list(range(10, 15))
        assert kept_minority_b == list(range(30, 35))
