"""kNN-graph operator: distributed block-pair top-k vs the independent
naive reference, block-partitioning invariance, and structural invariants.

The similarity is an exact integer dot product (PCA quantization grid), so
equality here is byte-equality — no tolerance anywhere.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.knn import knn_graph, knn_graph_reference

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reference():
    return knn_graph_reference(SF).to_pandas()


@pytest.fixture(scope="module")
def distributed(ray_session):
    return knn_graph(SF).to_pandas()


def test_matches_naive_reference(distributed, reference):
    pd.testing.assert_frame_equal(
        distributed.reset_index(drop=True), reference.reset_index(drop=True)
    )


def test_block_partitioning_invariance(ray_session, reference):
    """Tiny blocks (many block pairs, partial top-k merging exercised)
    produce the identical graph."""
    small = knn_graph(SF, block_rows=64).to_pandas()
    pd.testing.assert_frame_equal(
        small.reset_index(drop=True), reference.reset_index(drop=True)
    )


def test_structure(distributed):
    n = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    k = 5
    assert len(distributed) == n * k
    # every vector appears with ranks exactly 1..k
    by_vec = distributed.groupby("vec_id")["rank"].agg(["min", "max", "count"])
    assert (by_vec["min"] == 1).all()
    assert (by_vec["max"] == k).all()
    assert (by_vec["count"] == k).all()
    # no self edges, no duplicate neighbors per vector
    assert (distributed["vec_id"] != distributed["neighbor_id"]).all()
    assert not distributed.duplicated(["vec_id", "neighbor_id"]).any()
    # dots are non-increasing within each vector's ranked list
    for _, g in distributed.groupby("vec_id"):
        d = g.sort_values("rank")["dot"].to_numpy()
        assert (np.diff(d) <= 0).all()


def test_rank_tiebreak_is_neighbor_ascending(distributed):
    """Where consecutive ranks share a dot value, neighbor ids ascend."""
    for _, g in distributed.groupby("vec_id"):
        g = g.sort_values("rank")
        d = g["dot"].to_numpy()
        nb = g["neighbor_id"].to_numpy()
        ties = d[1:] == d[:-1]
        assert (nb[1:][ties] > nb[:-1][ties]).all()
