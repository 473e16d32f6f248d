"""Neyman variance-proportional allocation."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.sampling import neyman_allocation


def _write_docs(d, rows):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(rows))), pa.int64()),
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestNeyman:
    def test_zero_variance_stratum_gets_nothing(self, tmp_path):
        rows = [("uniform", "a b c")] * 10  # identical token counts
        rows += [("spread", "x"), ("spread", "x " * 50)]
        sf = _write_docs(tmp_path / "n", rows)
        got = {r["source"]: r for r in neyman_allocation(sf).take_all()}
        assert got["uniform"]["w_q"] == 0 and got["uniform"]["alloc"] == 0
        assert got["spread"]["alloc"] == 10_000  # all budget to the noisy stratum

    def test_matches_identity(self, tmp_path):
        rows = [("a", "w " * k) for k in (1, 3, 9, 27)]
        rows += [("b", "w " * k) for k in (5, 5, 6, 6)]
        sf = _write_docs(tmp_path / "i", rows)
        got = {r["source"]: r for r in neyman_allocation(sf).take_all()}
        for src, counts in (("a", [1, 3, 9, 27]), ("b", [5, 5, 6, 6])):
            x = np.array(counts, dtype=np.int64)
            a = len(x) * int((x * x).sum()) - int(x.sum()) ** 2
            assert got[src]["w_q"] == int(np.round(math.sqrt(float(a))))
        tot = got["a"]["w_q"] + got["b"]["w_q"]
        assert got["a"]["alloc"] == 10_000 * got["a"]["w_q"] // tot
