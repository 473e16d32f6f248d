"""PMI collocations, lexical diversity, and the exact quantized PCA moments."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.colloc import pmi_collocations
from ocr_engine_ray.pipelines.pca import (
    PCA_Q,
    embedding_gram,
    pca_components,
    pca_project,
)
from ocr_engine_ray.pipelines.textstats import lexical_diversity

SF = "/root/testdata/sf0.001"
_TOK = re.compile(r"[^ \t\n\f\r]+")


def _naive_pmi(rows, *, min_count=3, k=50):
    """Independent sequential PMI reference (Counter-based)."""
    pair: Counter = Counter()
    for r in rows:
        toks = _TOK.findall(r["text"] or "")
        pair.update(zip(toks, toks[1:]))
    t = sum(pair.values())
    c1: Counter = Counter()
    c2: Counter = Counter()
    for (a, b), c in pair.items():
        c1[a] += c
        c2[b] += c
    out = []
    for (a, b), c in pair.items():
        if c < min_count:
            continue
        q = round(math.log(float(c * t) / float(c1[a] * c2[b])) * float(1 << 40))
        out.append((-q, a, b, c))
    out.sort()
    return [(a, b, c, -nq) for nq, a, b, c in out[:k]]


@pytest.mark.usefixtures("ray_session")
class TestPMI:
    def test_matches_naive_reference(self):
        docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pylist()
        want = _naive_pmi(docs)
        got = [
            (r["w1"], r["w2"], r["c12"], r["pmi_q"])
            for r in pmi_collocations(SF).take_all()
        ]
        assert got == want

    def test_bucket_invariance(self):
        a = [tuple(r.values()) for r in pmi_collocations(SF, num_buckets=7).take_all()]
        b = [tuple(r.values()) for r in pmi_collocations(SF, num_buckets=64).take_all()]
        assert a == b

    def test_float_surface_derives_from_quantized(self):
        for r in pmi_collocations(SF).take_all():
            assert r["pmi"] == round(float(r["pmi_q"]) / float(1 << 40), 6)


@pytest.mark.usefixtures("ray_session")
class TestLexicalDiversity:
    def test_matches_naive_reference(self):
        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["source", "text"]
        ).to_pylist()
        tot: Counter = Counter()
        uniq: dict[str, set] = {}
        for r in docs:
            toks = _TOK.findall(r["text"] or "")
            tot[r["source"]] += len(toks)
            uniq.setdefault(r["source"], set()).update(toks)
        want = [
            (s, tot[s], len(uniq[s]), round(len(uniq[s]) / tot[s], 6))
            for s in sorted(tot)
            if tot[s]
        ]
        got = [
            (r["source"], r["n_tokens"], r["n_unique_tokens"], r["ttr"])
            for r in lexical_diversity(SF).take_all()
        ]
        assert got == want

    def test_bucket_invariance(self):
        a = [tuple(r.values()) for r in lexical_diversity(SF, num_buckets=5).take_all()]
        b = [tuple(r.values()) for r in lexical_diversity(SF, num_buckets=64).take_all()]
        assert a == b

    def test_tokenless_source_absent(self, tmp_path):
        d = tmp_path / "lx"
        d.mkdir()
        rows = [
            {"doc_id": 0, "text": "a b a", "source": "s0"},
            {"doc_id": 1, "text": "   ", "source": "s1"},
        ]
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = lexical_diversity(str(d)).take_all()
        assert [r["source"] for r in got] == ["s0"]
        assert got[0]["n_tokens"] == 3 and got[0]["n_unique_tokens"] == 2


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingGram:
    def test_matches_direct_numpy(self):
        x = np.array(
            pq.read_table(f"{SF}/embeddings.parquet").column("embedding").to_pylist(),
            dtype=np.float64,
        )
        q = np.round(x * PCA_Q).astype(np.int64)
        gram = q.T @ q
        sums = q.sum(axis=0)
        got = {(r["dim_i"], r["dim_j"]): r["s"] for r in embedding_gram(SF).take_all()}
        d = x.shape[1]
        assert got[(-1, -1)] == len(x)
        for i in range(d):
            assert got[(i + 1, -1)] == sums[i]
        for i in range(d):
            for j in range(i, d):
                assert got[(i + 1, j + 1)] == gram[i, j]

    def test_pca_components_diagonalize_covariance(self):
        vals, comps = pca_components(SF, n_components=4)
        assert vals.shape == (4,) and comps.shape[0] == 4
        assert (np.diff(vals) <= 1e-12).all()  # descending
        # components are orthonormal and reproduce their eigenvalues
        assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-10)
        x = np.array(
            pq.read_table(f"{SF}/embeddings.parquet").column("embedding").to_pylist(),
            dtype=np.float64,
        )
        xq = np.round(x * PCA_Q) / PCA_Q  # the quantized grid the moments use
        c = np.cov(xq, rowvar=False, bias=True)
        assert np.allclose(comps @ c @ comps.T, np.diag(vals), atol=1e-10)
        # sign convention: the largest-|coordinate| entry is positive
        peak = comps[np.arange(4), np.abs(comps).argmax(axis=1)]
        assert (peak > 0).all()

    def test_projection_variance_matches_eigenvalues(self):
        vals, _ = pca_components(SF, n_components=3)
        proj = np.array(
            [r["projection"] for r in pca_project(SF, n_components=3).take_all()]
        )
        assert np.allclose(proj.var(axis=0), vals, rtol=1e-9)


@pytest.mark.usefixtures("ray_session")
class TestSourceVocabOverlap:
    def test_matches_naive_reference(self):
        from itertools import combinations

        from ocr_engine_ray.pipelines.textstats import source_vocab_overlap

        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["source", "text"]
        ).to_pylist()
        vocab: dict[str, set] = {}
        for r in docs:
            vocab.setdefault(r["source"], set()).update(_TOK.findall(r["text"] or ""))
        want = []
        for a, b in combinations(sorted(vocab), 2):
            n = len(vocab[a] & vocab[b])
            if n:
                want.append((a, b, n, round(n / (len(vocab[a]) + len(vocab[b]) - n), 6)))
        got = [
            (r["src_a"], r["src_b"], r["n_common"], r["jaccard"])
            for r in source_vocab_overlap(SF).take_all()
        ]
        assert got == want

    def test_planted_diverse_vocabularies(self, tmp_path):
        # the driver corpus shares one vocabulary (jaccard ~1 everywhere);
        # this planted corpus pins partial and zero overlaps
        from ocr_engine_ray.pipelines.textstats import source_vocab_overlap

        d = tmp_path / "ov"
        d.mkdir()
        rows = [
            {"doc_id": 0, "source": "a", "text": "x y z"},
            {"doc_id": 1, "source": "b", "text": "y z w"},
            {"doc_id": 2, "source": "c", "text": "p q"},
        ]
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = [
            (r["src_a"], r["src_b"], r["n_common"], r["jaccard"])
            for r in source_vocab_overlap(str(d)).take_all()
        ]
        # a∩b = {y,z} → 2/(3+3-2); c is disjoint → absent
        assert got == [("a", "b", 2, 0.5)]

    def test_bucket_invariance(self):
        from ocr_engine_ray.pipelines.textstats import source_vocab_overlap

        x = [tuple(r.values()) for r in source_vocab_overlap(SF, num_buckets=5).take_all()]
        y = [tuple(r.values()) for r in source_vocab_overlap(SF, num_buckets=64).take_all()]
        assert x == y
