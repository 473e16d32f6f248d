"""Rendezvous (HRW) placement planner."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.diagnostics import rendezvous_plan

SF = "/root/testdata/sf0.001"


def _naive_assign(src: str, n_workers: int) -> int:
    return max(
        range(n_workers),
        key=lambda w: hashlib.md5(f"{src}\x1f{w}".encode()).hexdigest(),
    )


@pytest.mark.usefixtures("ray_session")
class TestRendezvous:
    def test_matches_naive_on_real_data(self):
        t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
        rows = t.to_pylist()
        from collections import Counter

        docs = Counter(r["source"] for r in rows)
        chars = Counter()
        for r in rows:
            chars[r["source"]] += len(r["text"] or "")
        got = [tuple(r.values()) for r in rendezvous_plan(SF).take_all()]
        want = [
            (s, _naive_assign(s, 16), docs[s], chars[s]) for s in sorted(docs)
        ]
        assert got == want

    def test_no_churn_on_resize(self):
        """The HRW property: growing n workers only moves keys TO the new
        worker — every key not on the new worker keeps its assignment."""
        sources = [f"src{i}" for i in range(200)]
        for n in range(2, 24):
            before = {s: _naive_assign(s, n) for s in sources}
            after = {s: _naive_assign(s, n + 1) for s in sources}
            for s in sources:
                if after[s] != n:  # not moved to the new worker
                    assert after[s] == before[s]

    def test_balance_is_reasonable(self):
        """With many keys, no worker should own a wildly outsized share."""
        sources = [f"key-{i}" for i in range(4000)]
        from collections import Counter

        load = Counter(_naive_assign(s, 16) for s in sources)
        assert len(load) == 16
        assert max(load.values()) < 2.0 * (4000 / 16)
