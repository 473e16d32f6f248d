"""Incremental re-extraction delta (CDC over the extraction engine).

Three layers, like the dedup digest gates:
  1. the pinned literals in `oracle_sql()['extraction_delta']` equal a fresh
     run of the INDEPENDENT sequential oracle (re-extracts v1 and the v2
     overlay per-doc with `ocr_engine_ray.oracle.extract_document`),
  2. the distributed pipeline reproduces the oracle tuple bit-for-bit,
  3. the result is invariant to the bucket count (shuffle-shape freedom).
"""

from __future__ import annotations

import re
import sys

import pytest

sys.path.insert(0, "/root/repo")

from ocr_engine_ray.oracle_dedup import extraction_delta_oracle
from ocr_engine_ray.pipelines.extract_stats import extraction_delta

SF_SMALL = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int, int]:
    import __ray_entry__ as entry

    sql = entry.oracle_sql()["extraction_delta"]
    nums = re.findall(r"(\d+)::BIGINT", sql)
    assert len(nums) == 3
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == extraction_delta_oracle(SF_GATE)


def test_pipeline_matches_oracle_small(ray_session):
    t = extraction_delta(SF_SMALL)
    row = t.to_pylist()[0]
    assert (
        row["n_docs"],
        row["n_changed"],
        row["digest"],
    ) == extraction_delta_oracle(SF_SMALL)
    # the overlay must actually change something for the test to bite
    assert row["n_changed"] > 0


def test_pipeline_matches_literal_at_gate_scale(ray_session):
    t = extraction_delta(SF_GATE)
    row = t.to_pylist()[0]
    assert (row["n_docs"], row["n_changed"], row["digest"]) == _pinned()


def test_bucket_invariance(ray_session):
    a = extraction_delta(SF_SMALL, num_buckets=3).to_pylist()
    b = extraction_delta(SF_SMALL, num_buckets=17).to_pylist()
    assert a == b
