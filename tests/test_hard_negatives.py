"""Hard-negative mining (pipelines/ann.py:hard_negatives)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.ann import hard_negatives

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def labeled_sf(tmp_path):
    """Embeddings in 3 labeled clusters plus one null-label row: the top
    same-cluster vectors must NOT appear as negatives; null labels are
    excluded entirely (SQL `<>` three-valued logic)."""
    rng = np.random.default_rng(41)
    centers = rng.standard_normal((3, 12))
    rows = []
    for i in range(60):
        lab = i % 3
        v = centers[lab] + rng.standard_normal(12) * 0.05
        v = v / np.linalg.norm(v)
        rows.append(
            {
                "vec_id": i,
                "embedding": [float(x) for x in v],
                "label": None if i == 59 else lab,
            }
        )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "embeddings.parquet"))
    return str(d)


def _numpy_reference(sf: str, num_queries: int, k: int) -> dict[int, list[int]]:
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    labs = t.column("label").to_pylist()
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1)[:, None]
    order = np.argsort(ids)[:num_queries]
    exp: dict[int, list[int]] = {}
    for qi in order:
        if labs[qi] is None:
            exp[int(ids[qi])] = []
            continue
        sims = m @ m[qi]
        cand = [
            (-sims[j], int(ids[j]))
            for j in range(len(ids))
            if labs[j] is not None and labs[j] != labs[qi] and j != qi
        ]
        exp[int(ids[qi])] = [v for _, v in sorted(cand)[:k]]
    return {q: v for q, v in exp.items() if v}


@pytest.mark.usefixtures("ray_session")
class TestHardNegatives:
    def test_matches_numpy_reference(self, labeled_sf):
        got = hard_negatives(labeled_sf, num_queries=4, k=6).to_pandas()
        by_q: dict[int, list[int]] = {}
        for _, r in got.sort_values(["query_id", "rank"]).iterrows():
            by_q.setdefault(int(r["query_id"]), []).append(int(r["vec_id"]))
        assert by_q == _numpy_reference(labeled_sf, 4, 6)

    def test_no_same_label_leaks(self, labeled_sf):
        t = pq.read_table(f"{labeled_sf}/embeddings.parquet")
        labs = dict(zip(t.column("vec_id").to_pylist(), t.column("label").to_pylist()))
        for r in hard_negatives(labeled_sf, num_queries=4, k=6).take_all():
            assert labs[r["vec_id"]] is not None
            assert labs[r["vec_id"]] != labs[r["query_id"]]

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = (
            hard_negatives(SF)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
        )
        want = (
            con.execute(e.oracle_sql()["hard_negatives"])
            .df()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
