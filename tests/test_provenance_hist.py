"""Field-provenance page histogram over the rich-fields surface."""

from __future__ import annotations

import re

import pytest

from ocr_engine_ray.oracle_dedup import field_provenance_rows
from ocr_engine_ray.pipelines.interpret import (
    field_provenance_digest,
    field_provenance_histogram,
)

SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> tuple[int, int]:
    import __ray_entry__ as e

    nums = re.findall(r"(\d+)::BIGINT", e.oracle_sql()["field_provenance_digest"])
    assert len(nums) == 2
    return tuple(int(x) for x in nums)


def test_literal_matches_oracle():
    assert _pinned() == field_provenance_rows(SF_GATE)


@pytest.mark.usefixtures("ray_session")
def test_gate_scale_agreement_and_shape():
    sf = "/root/testdata/sf0.001"
    t = field_provenance_digest(sf)
    eng = (t.column("n_rows")[0].as_py(), t.column("digest")[0].as_py())
    assert eng == field_provenance_rows(sf)
    rows = field_provenance_histogram(sf).take_all()
    assert rows, "corpus must surface provenance rows"
    assert all(r["page"] >= 1 and r["n_docs"] >= 1 for r in rows)
