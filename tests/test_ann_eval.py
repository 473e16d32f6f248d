"""ANN search-quality evaluation (recall@k, NDCG@k)."""

from __future__ import annotations

import re

import pytest

from ocr_engine_ray.oracle_dedup import ann_eval_rows
from ocr_engine_ray.pipelines.ann import _eval_rows_from_lists, ann_eval_digest

SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["ann_eval_digest"])
    assert len(nums) == 2
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == ann_eval_rows(SF_GATE)


def test_eval_math_known_values():
    # truth: q1 -> {10, 11, 12}; method hits 10 at rank 1 and 12 at rank 3
    truth = [(1, 1, 10), (1, 2, 11), (1, 3, 12)]
    method = [(1, 1, 10), (1, 2, 99), (1, 3, 12)]
    rows = _eval_rows_from_lists(truth, {"m": method}, k=3)
    (name, n_q, recall, ndcg_q) = rows[0]
    assert name == "m" and n_q == 1
    assert recall == 2 * 1_000_000 // 3
    import math

    idcg = sum(1.0 / math.log2(r + 1) for r in (1, 2, 3))
    dcg = 1.0 / math.log2(2) + 1.0 / math.log2(4)
    assert ndcg_q == round(dcg / idcg * float(1 << 40))


def test_perfect_method_scores_one():
    truth = [(5, r, 100 + r) for r in range(1, 6)]
    rows = _eval_rows_from_lists(truth, {"p": truth}, k=5)
    assert rows[0][2] == 1_000_000
    assert rows[0][3] == 1 << 40


@pytest.mark.usefixtures("ray_session")
def test_gate_scale_agreement():
    sf = "/root/testdata/sf0.001"
    t = ann_eval_digest(sf)
    eng = (t.column("n_rows")[0].as_py(), t.column("digest")[0].as_py())
    assert eng == ann_eval_rows(sf)
