"""Reciprocal-rank fusion (pipelines/ann.py:rrf_fused_topk)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.ann import rrf_fused_topk

SF = "/root/testdata/sf0.001"


def _fetch(sf, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    return con.execute(sql).df()


@pytest.mark.usefixtures("ray_session")
class TestRrfFusion:
    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = (
            rrf_fused_topk(SF)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        want = (
            _fetch(SF, e.oracle_sql()["rrf_fused_topk"])
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_fusion_prefers_double_listed(self, tmp_path):
        """A vector ranked #1 by BOTH metrics must out-score any vector
        on only one list; a disagreeing pair must both still appear."""
        rng = np.random.default_rng(3)
        base = rng.standard_normal(8)
        base /= np.linalg.norm(base)
        rows = [{"vec_id": 0, "embedding": [float(x) for x in base], "label": 0}]
        # vec 1: same direction, same magnitude → top by cosine AND L2
        rows.append(
            {"vec_id": 1, "embedding": [float(x) for x in base * 1.0001], "label": 0}
        )
        # vec 2: same direction, huge magnitude → great cosine, bad L2
        rows.append(
            {"vec_id": 2, "embedding": [float(x) for x in base * 50], "label": 0}
        )
        # fillers
        for i in range(3, 10):
            v = rng.standard_normal(8) * 5
            rows.append({"vec_id": i, "embedding": [float(x) for x in v], "label": 0})
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "embeddings.parquet"))
        out = rrf_fused_topk(str(d), num_queries=1, k=3).to_pandas()
        q0 = out[out["query_id"] == 0].sort_values("rank")
        assert q0["vec_id"].iloc[0] == 1  # consensus winner fuses first
        assert 2 in set(q0["vec_id"])     # single-list member still surfaces

    def test_rank_sequence_dense(self):
        out = rrf_fused_topk(SF).to_pandas()
        for _, g in out.groupby("query_id"):
            assert sorted(g["rank"].tolist()) == list(range(1, len(g) + 1))
