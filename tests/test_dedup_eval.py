"""Dedup-quality evaluation: sketch paths vs exact Jaccard truth."""

from __future__ import annotations

import re

import pytest

from ocr_engine_ray.oracle_dedup import dedup_eval_rows
from ocr_engine_ray.pipelines.dedup import dedup_eval_digest, dedup_eval_report

SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["dedup_eval_digest"])
    assert len(nums) == 2
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == dedup_eval_rows(SF_GATE)


@pytest.mark.usefixtures("ray_session")
def test_gate_scale_agreement_and_sanity():
    sf = "/root/testdata/sf0.001"
    t = dedup_eval_digest(sf)
    eng = (t.column("n_rows")[0].as_py(), t.column("digest")[0].as_py())
    assert eng == dedup_eval_rows(sf)
    rep = {r["method"]: r for r in dedup_eval_report(sf).to_pylist()}
    assert set(rep) == {"minhash_lsh", "simhash"}
    for r in rep.values():
        assert 0 <= r["precision_ppm"] <= 1_000_000
        assert 0 <= r["recall_ppm"] <= 1_000_000
