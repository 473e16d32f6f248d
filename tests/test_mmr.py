"""MMR diverse top-k selection (pipelines/ann.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.oracle_dedup import mmr_select
from ocr_engine_ray.pipelines.ann import ann_topk_bruteforce, mmr_diverse_topk

SF = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


def _pinned() -> list[tuple[int, int]]:
    import __ray_entry__ as e

    con = duckdb.connect()
    return [
        (int(a), int(b))
        for a, b in con.execute(e.oracle_sql()["mmr_diverse_topk"]).fetchall()
    ]


def test_literal_matches_oracle():
    assert _pinned() == mmr_select(SF_GATE)


@pytest.mark.usefixtures("ray_session")
class TestMmr:
    def test_pipeline_matches_oracle(self):
        for sf in (SF, SF_GATE):
            got = [
                (r["rank"], r["vec_id"])
                for r in mmr_diverse_topk(sf).to_pylist()
            ]
            assert got == mmr_select(sf), sf

    def test_more_diverse_than_pure_topk(self):
        """MMR's defining property: max pairwise similarity inside the
        selected set is <= the pure relevance top-k's."""
        t = pq.read_table(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        vid = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        mn = m / n[:, None]
        by_id = {int(v): mn[i] for i, v in enumerate(vid)}

        def max_pairwise(ids):
            vecs = np.array([by_id[i] for i in ids])
            s = vecs @ vecs.T
            np.fill_diagonal(s, -np.inf)
            return float(s.max())

        mmr_ids = [r["vec_id"] for r in mmr_diverse_topk(SF).to_pylist()]
        topk = ann_topk_bruteforce(SF, num_queries=1, k=10).take_all()
        rel_ids = [r["vec_id"] for r in sorted(topk, key=lambda r: r["rank"])]
        assert max_pairwise(mmr_ids) <= max_pairwise(rel_ids) + 1e-12
        # and the first pick is the pure-relevance argmax
        assert mmr_ids[0] == rel_ids[0]
