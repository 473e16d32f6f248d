"""Binary-quantization search: exact threshold, Hamming cut, q20 rerank."""

from __future__ import annotations

import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import bq_rows
from ocr_engine_ray.pipelines.ann import bq_digest, bq_topk

SF = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["bq_digest"])
    assert len(nums) == 2
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == bq_rows(SF_GATE)


def _exact_same_metric(sf, k=5, num_queries=8):
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    xq = np.round(m * (1 << 20)).astype(np.int64)
    out = set()
    for q in np.argsort(vid)[:num_queries]:
        idx = np.nonzero(vid != vid[q])[0]  # exclude self BEFORE negation
        s = xq[idx] @ xq[q]
        for i in idx[np.lexsort((vid[idx], -s))[:k]]:
            out.add((int(vid[q]), int(vid[i])))
    return out


@pytest.mark.usefixtures("ray_session")
class TestBinaryQuantization:
    def test_engine_matches_sequential_oracle(self):
        t = bq_digest(SF)
        eng = (t.column("n_rows")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == bq_rows(SF)

    def test_batching_invariance(self):
        import ray

        a = bq_topk(SF)
        # different batch size exercises different partial candidate cuts
        from ocr_engine_ray.sources.tables import sf_table  # noqa: F401

        b = bq_topk(SF, n_candidates=257)
        # 257 vs 256 candidates may admit one more row to rerank, but the
        # top-5 under exact scoring must agree when recall is saturated
        ra = [tuple(r.values()) for r in a.to_pylist()]
        rb = [tuple(r.values()) for r in b.to_pylist()]
        assert ra == rb

    def test_recall_floor_vs_exact_same_metric(self):
        want = _exact_same_metric(SF)
        got = {(r["query_id"], r["vec_id"]) for r in bq_topk(SF).to_pylist()}
        recall = len(got & want) / len(want)
        assert recall >= 0.9  # measured 1.0 at C=256 over the 500-vector corpus

    def test_candidate_oversampling_monotone(self):
        # widening the candidate cut can only improve same-metric recall
        want = _exact_same_metric(SF)
        r_small = len(
            {(r["query_id"], r["vec_id"]) for r in bq_topk(SF, n_candidates=16).to_pylist()}
            & want
        )
        r_big = len(
            {(r["query_id"], r["vec_id"]) for r in bq_topk(SF, n_candidates=499).to_pylist()}
            & want
        )
        assert r_big >= r_small
        assert r_big == len(want)  # full-corpus candidates == exact search
