"""Reciprocal (mutual) kNN pairs."""

from __future__ import annotations

import pytest

from ocr_engine_ray.pipelines.knn import knn_graph, mutual_knn_pairs

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestMutualKnn:
    def test_subset_of_knn_and_symmetric(self):
        g = {
            (r["vec_id"], r["neighbor_id"])
            for r in knn_graph(SF).take_all()
        }
        pairs = [(r["a"], r["b"]) for r in mutual_knn_pairs(SF).take_all()]
        assert pairs  # the clustered corpus has reciprocal neighbors
        for a, b in pairs:
            assert a < b
            assert (a, b) in g and (b, a) in g  # both directions in top-k

    def test_non_mutual_excluded(self):
        g = {}
        for r in knn_graph(SF).take_all():
            g.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
        mutual = {(r["a"], r["b"]) for r in mutual_knn_pairs(SF).take_all()}
        want = {
            (min(a, b), max(a, b))
            for a, nbrs in g.items()
            for b in nbrs
            if a in g.get(b, set())
        }
        assert mutual == want

    def test_bucket_invariance(self):
        a = [tuple(r.values()) for r in mutual_knn_pairs(SF, num_buckets=5).take_all()]
        b = [tuple(r.values()) for r in mutual_knn_pairs(SF, num_buckets=64).take_all()]
        assert a == b
