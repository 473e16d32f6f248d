"""Query-directed multi-probe LSH."""

from __future__ import annotations

import re

import numpy as np
import pytest

from ocr_engine_ray.oracle_dedup import multiprobe_rows
from ocr_engine_ray.pipelines.ann import (
    _probe_sets,
    ann_mp_digest,
    ann_topk_bruteforce,
    ann_topk_lsh_multiprobe,
)

SF = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["ann_mp_digest"])
    assert len(nums) == 2
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == multiprobe_rows(SF_GATE)


def test_probe_sets_order_and_bounds():
    margins = np.array([0.5, 0.1, 0.3, 0.9])
    sets = _probe_sets(margins, 6)
    assert sets[0] == ()  # exact bucket first
    assert sets[1] == (1,)  # smallest margin flips first
    assert len(sets) == 6
    # costs are non-decreasing along the sequence
    costs = [sum(margins[list(s)] ** 2) for s in sets]
    assert costs == sorted(costs)
    # flip-set members are distinct plane indices
    for s in sets:
        assert len(set(s)) == len(s)


def test_probe_sets_cover_all_singles_eventually():
    margins = np.array([0.4, 0.2, 0.6])
    sets = _probe_sets(margins, 8)
    singles = {s[0] for s in sets if len(s) == 1}
    assert singles == {0, 1, 2}


@pytest.mark.usefixtures("ray_session")
class TestMultiProbe:
    def test_engine_matches_sequential_oracle(self):
        t = ann_mp_digest(SF)
        eng = (t.column("n_rows")[0].as_py(), t.column("digest")[0].as_py())
        assert eng == multiprobe_rows(SF)

    def test_recall_scales_with_probe_budget(self):
        bf = {(r["query_id"], r["vec_id"]) for r in ann_topk_bruteforce(SF).take_all()}

        def recall(probes):
            mp = {
                (r["query_id"], r["vec_id"])
                for r in ann_topk_lsh_multiprobe(SF, num_probes=probes).take_all()
            }
            return len(mp & bf) / len(bf)

        # the decoupled-budget contract: more probes at fixed planes can
        # only widen the candidate set (recall non-decreasing)
        assert recall(64) >= recall(8)
