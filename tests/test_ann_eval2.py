"""Eval harness over the r4c13 search paths."""

from __future__ import annotations

import re

import pytest

from ocr_engine_ray.oracle_dedup import ann_eval2_rows
from ocr_engine_ray.pipelines.ann import ann_eval2_digest, ann_eval2_report

SF = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["ann_eval2_digest"])
    assert len(nums) == 2
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == ann_eval2_rows(SF_GATE)


@pytest.mark.usefixtures("ray_session")
class TestAnnEval2:
    def test_engine_matches_sequential_oracle(self):
        t = ann_eval2_digest(SF)
        eng = (t.column("n_rows")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == ann_eval2_rows(SF)

    def test_bq_dominates_multiprobe_here(self):
        rows = {r["method"]: r for r in ann_eval2_report(SF).to_pylist()}
        assert set(rows) == {"bq", "multiprobe"}
        # the documented geometry story: oversampled BQ rerank saturates,
        # single-table angle LSH does not
        assert rows["bq"]["mean_recall_ppm"] == 1_000_000
        assert rows["bq"]["mean_recall_ppm"] > rows["multiprobe"]["mean_recall_ppm"]
