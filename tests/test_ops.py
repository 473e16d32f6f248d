"""Tests for the training-data ops: dedup, ANN, text stats, multimodal."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.functions import textstats as ts
from ocr_engine_ray.pipelines import ann as annp
from ocr_engine_ray.pipelines import dedup as dd
from ocr_engine_ray.stages.multimodal import (
    MediaDecoder,
    fake_image_meta,
    frame_sample_plan,
    thumbnail_dims,
)

# ---------------------------------------------------------------- textstats


class TestTextstats:
    def test_normalize(self):
        assert ts.normalize_text("  A\t\nB  c ") == "a b c"

    def test_fingerprint_matches_sql_semantics(self):
        import hashlib

        t = "Hello   World\n"
        assert ts.fingerprint_md5(t) == hashlib.md5(b"hello world").hexdigest()

    def test_token_counts(self):
        assert ts.token_count_ws("a  b\tc") == 3
        assert ts.token_count_ws("") == 0
        assert ts.token_count_bpe_ish("don't stop 123x") == 6  # don ' t stop 123 x

    def test_langid(self):
        assert ts.langid("the cat and the dog of it") == "en"
        assert ts.langid("der hund und die katze ist") == "de"
        assert ts.langid("el perro de la casa que") == "es"
        assert ts.langid("中文文本") == "zh"
        assert ts.langid("नमस्ते दुनिया") == "hi"
        assert ts.langid("xyzzy qwerty") == "en"  # no signal → default

    def test_quality(self):
        good = ts.quality_score("the quick brown fox jumps over the lazy dog " * 3)
        bad = ts.quality_score("@@@ ### 123 456 !!! %%%")
        assert 0 <= bad < good <= 1

    def test_winnow_deterministic_and_robust(self):
        a = ts.winnow_fingerprint("the quick brown fox jumps over the lazy dog")
        b = ts.winnow_fingerprint("the quick brown fox jumps over the lazy dog")
        assert a == b and len(a) > 0
        # a near-duplicate shares most winnowed hashes
        c = ts.winnow_fingerprint("the quick brown fox leaps over the lazy dog")
        shared = len(set(a) & set(c)) / len(set(a) | set(c))
        assert shared >= 0.5


# ---------------------------------------------------------------- dedup units


class TestDedupUnits:
    def test_shingles_and_jaccard(self):
        s1 = dd._shingles("a b c d e")
        s2 = dd._shingles("a b c d e")
        assert s1 == s2
        assert dd.jaccard(s1, s2) == 1.0
        assert dd.jaccard(set(), set()) == 1.0
        assert dd.jaccard(s1, set()) == 0.0

    def test_minhash_estimates_jaccard(self):
        t1 = " ".join(f"w{i}" for i in range(100))
        t2 = " ".join(f"w{i}" for i in range(5, 105))  # high overlap
        t3 = " ".join(f"z{i}" for i in range(100))  # disjoint
        s1, s2, s3 = (dd.minhash_signature(t) for t in (t1, t2, t3))
        sim12 = (s1 == s2).mean()
        sim13 = (s1 == s3).mean()
        true12 = dd.jaccard(dd._shingles(t1), dd._shingles(t2))
        assert abs(sim12 - true12) < 0.2
        assert sim13 < 0.1

    def test_coarse_bucket_pairs_matches_naive_reference(self):
        """The vectorized coarse-bucket pair generator must emit exactly the
        pair set a naive per-(band, bhash) loop would: first MAX_BUCKET
        doc_ids ascending per bucket, all unordered pairs among them —
        across randomized dup-heavy band tables including over-cap runs."""
        rng = np.random.default_rng(7)
        for trial in range(5):
            n = int(rng.integers(50, 400))
            band = rng.integers(0, 4, size=n)
            # few distinct hashes → many shared buckets, some over MAX_BUCKET
            bh = np.array([f"h{v:02d}" for v in rng.integers(0, 6, size=n)])
            doc = rng.choice(10_000, size=n, replace=False).astype(np.int64)
            tbl = pa.table(
                {
                    "band": pa.array(band, pa.int32()),
                    "bhash": pa.array(bh.tolist(), pa.string()),
                    "doc_id": pa.array(doc, pa.int64()),
                }
            )
            got = dd._coarse_bucket_pairs(tbl)
            got_pairs = set(zip(got["a"].to_pylist(), got["b"].to_pylist()))
            want: set[tuple[int, int]] = set()
            buckets: dict[tuple[int, str], list[int]] = {}
            for b, h_, d in zip(band.tolist(), bh.tolist(), doc.tolist()):
                buckets.setdefault((b, h_), []).append(d)
            for ids in buckets.values():
                ids = sorted(ids)[: dd.MAX_BUCKET]
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        want.add((ids[i], ids[j]))
            assert got_pairs == want, f"trial {trial}"
            assert len(got_pairs) == got.num_rows  # no duplicate emission

    def test_simhash_hamming(self):
        t1 = "the quick brown fox jumps over the lazy dog again and again"
        t2 = "the quick brown fox jumps over the lazy cat again and again"
        t3 = "completely different content about spark query engines here"
        h = lambda a, b: bin(dd.simhash64(a) ^ dd.simhash64(b)).count("1")
        assert h(t1, t1) == 0
        assert h(t1, t2) < h(t1, t3)

    def test_simhash_batch_byte_identical(self):
        """The vectorized batch SimHash (cross-doc word-hash cache + one
        reduceat bit-majority) must equal per-doc simhash64 exactly,
        including empty/None/whitespace-only/unicode edges."""
        import numpy as np

        texts = [
            "",
            None,
            "   ",
            "one",
            "a b c a b",
            "\t\n",
            "Ünïcode wörds 123_abc",
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
            "words repeat words repeat words repeat across docs",
        ] * 7  # repeats exercise the cross-doc cache path
        got = dd.simhash_batch(texts)
        want = np.array([dd.simhash64(t) for t in texts], dtype=np.uint64)
        assert np.array_equal(got, want)

    def test_minhash_batch_byte_identical(self):
        """The vectorized batch MinHash (concatenated shingles + segmented
        minimum.reduceat per hash row) must equal per-doc minhash_signature
        exactly, including empty/None/short/unicode edges."""
        import numpy as np

        texts = [
            "",
            None,
            "   ",
            "one",  # < n words → single-crc shingle path
            "two words",
            "a b c a b c a b",  # repeated shingles → set dedup path
            "Ünïcode wörds 123_abc mixed CASE Tokens",
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
        ] * 3
        got = dd.minhash_signature_batch(texts)
        want = np.stack([dd.minhash_signature(t or "") for t in texts])
        assert got.dtype == np.uint64 and np.array_equal(got, want)

    def test_band_rows_matches_per_doc_loop(self):
        """_band_rows (batch signatures + offset-sliced blake2b keys) must
        reproduce the historical per-doc loop byte-for-byte: same rows, same
        doc-major/band-minor order, same cb/bhash values."""
        import hashlib

        import numpy as np

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "",
            "the quick brown fox jumps over the lazy dog",  # exact dup
            "short",
            "a very different document about distributed query engines",
        ]
        doc_ids = [10, 3, 99, 7, 42]
        got = dd._band_rows(
            pa.table(
                {
                    "doc_id": pa.array(doc_ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )
        rows = []
        for d, t in zip(doc_ids, texts):
            sig = dd.minhash_signature(t)
            for band in range(dd.NUM_BANDS):
                chunk = sig[band * dd.ROWS_PER_BAND : (band + 1) * dd.ROWS_PER_BAND]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                rows.append(
                    ((band + int(bh[:8], 16)) % dd.NUM_COARSE_BUCKETS, band, bh, d)
                )
        want = pa.table(
            {
                "cb": pa.array([r[0] for r in rows], pa.int32()),
                "band": pa.array([r[1] for r in rows], pa.int32()),
                "bhash": pa.array([r[2] for r in rows], pa.string()),
                "doc_id": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
        assert got.equals(want)

    def test_verify_pairs_jaccard_semantics(self):
        import numpy as np

        sh1 = np.array([1, 2, 3, 4], dtype="<u4").tobytes()
        sh2 = np.array([1, 2, 3, 5], dtype="<u4").tobytes()
        sh3 = np.array([9, 10], dtype="<u4").tobytes()
        group = pa.table(
            {
                "a": pa.array([1, 1, 1, 1], pa.int64()),
                "b": pa.array([2, 2, 3, 3], pa.int64()),
                "side": pa.array([0, 1, 0, 1], pa.int8()),
                "sh": pa.array([sh1, sh2, sh1, sh3], pa.binary()),
            }
        )
        out = dd._verify_pairs(group, threshold=0.5)
        assert out.column("a").to_pylist() == [1]  # J(1,2)=3/5 keeps, J(1,3)=0 drops
        assert out.column("b").to_pylist() == [2]


# ---------------------------------------------------------------- fixtures


def _write_corpus(tmp_path) -> str:
    """Mini sf-style dir with crafted dup structure."""
    base = "the quick brown fox jumps over the lazy dog while the band plays on"
    texts = {
        0: base,
        1: base,                                   # exact dup of 0
        2: base.replace("dog", "cat"),             # near dup of 0
        3: base.replace("quick", "slow").replace("dog", "wolf"),  # near-ish
        4: "completely unrelated text about ray data pipelines and arrow batches",
        5: "another unrelated document mentioning parquet files and shuffles",
        6: base + " extra tail words here",        # near dup of 0
    }
    rows = [
        {
            "doc_id": i,
            "text": t,
            "lang": "en",
            "source": f"src{i % 2}",
            "n_chars": len(t),
        }
        for i, t in texts.items()
    ]
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))

    # embeddings: 3 clusters of near-identical vectors + noise
    rng = np.random.default_rng(7)
    vecs = []
    for i in range(30):
        c = rng.standard_normal(16)
        vecs.append(c / np.linalg.norm(c))
    # make 31 a near-copy of 0 and 32 a near-copy of 1
    for src in (0, 1):
        v = np.array(vecs[src]) + rng.standard_normal(16) * 0.01
        vecs.append(v / np.linalg.norm(v))
    erows = [
        {"vec_id": i, "embedding": [float(x) for x in v], "label": 0}
        for i, v in enumerate(vecs)
    ]
    pq.write_table(pa.Table.from_pylist(erows), str(d / "embeddings.parquet"))
    return str(d)


# ---------------------------------------------------------------- pipelines


@pytest.mark.usefixtures("ray_session")
class TestDedupPipelines:
    def test_exact_dedup(self, tmp_path):
        sf = _write_corpus(tmp_path)
        rows = dd.exact_dedup(sf).take_all()
        ids = sorted(r["doc_id"] for r in rows)
        assert ids == [0, 2, 3, 4, 5, 6]  # doc 1 (exact dup of 0) dropped

    def test_minhash_lsh_finds_near_dups(self, tmp_path):
        sf = _write_corpus(tmp_path)
        rows = dd.minhash_lsh_dedup(sf, threshold=0.5).take_all()
        cl = {r["doc_id"]: r["cluster_id"] for r in rows}
        # 0, 1, 2, 6 all cluster together (exact + near dups)
        assert cl.get(0) == cl.get(1) == cl.get(2) == cl.get(6) == 0
        assert 4 not in cl and 5 not in cl

    def test_simhash_finds_exact_and_close(self, tmp_path):
        sf = _write_corpus(tmp_path)
        rows = dd.simhash_dedup(sf, max_hamming=3).take_all()
        cl = {r["doc_id"]: r["cluster_id"] for r in rows}
        assert cl.get(0) == cl.get(1) == 0  # exact dup always found
        assert cl.get(4) is None or cl[4] != cl[0]

    def test_embedding_near_dup(self, tmp_path):
        sf = _write_corpus(tmp_path)
        rows = dd.embedding_near_dup(sf, threshold=0.98).take_all()
        pairs = {(r["a"], r["b"]) for r in rows}
        assert (0, 30) in pairs and (1, 31) in pairs
        assert all(a < b for a, b in pairs)

    def test_ngram_jaccard_pairs(self, tmp_path):
        sf = _write_corpus(tmp_path)
        rows = dd.ngram_jaccard_pairs(sf, threshold=0.9).take_all()
        pairs = {(r["a"], r["b"]) for r in rows}
        assert (0, 1) in pairs  # exact duplicate pair
        assert all(a < b for a, b in pairs)

    def test_ppjoin_jaccard_pairs_equals_exact(self, tmp_path):
        sf = _write_corpus(tmp_path)
        for t in (0.9, 0.6):
            exact = dd.ngram_jaccard_pairs(sf, threshold=t).take_all()
            pp = dd.ppjoin_jaccard_pairs(sf, threshold=t, num_buckets=8).take_all()
            assert pp == exact
        pairs = {(r["a"], r["b"]) for r in pp}
        assert (0, 1) in pairs  # exact duplicate pair survives the prefix filter

    def test_embedding_near_dup_clusters(self, tmp_path):
        sf = _write_corpus(tmp_path)
        rows = dd.embedding_near_dup_clusters(sf, threshold=0.98).take_all()
        cl = {r["vec_id"]: r["cluster_id"] for r in rows}
        # planted near-copies (0,30) and (1,31) each form their own cluster
        assert cl[0] == cl[30] == 0
        assert cl[1] == cl[31] == 1

    def test_connected_components_chain_multibucket(self):
        import pyarrow as _pa
        import ray.data as rd

        from ocr_engine_ray.pipelines.graph import connected_components

        # A 40-node chain plus an isolated pair; force 4 buckets so the
        # alternating node/label contraction must cross bucket boundaries.
        a = list(range(100, 139)) + [500]
        b = list(range(101, 140)) + [501]
        edges = rd.from_arrow(
            _pa.table({"a": _pa.array(a, _pa.int64()), "b": _pa.array(b, _pa.int64())})
        )
        rows = connected_components(edges, num_partitions=4).take_all()
        cl = {r["doc_id"]: r["cluster_id"] for r in rows}
        assert len(cl) == 42
        assert all(cl[n] == 100 for n in range(100, 140))
        assert cl[500] == cl[501] == 500

    def test_minhash_multibucket_cc_identical(self, tmp_path):
        """Forcing the multi-bucket CC path (tiny rows_per_bucket) must give
        the identical clustering as the single-bucket fast path."""
        sf = _write_corpus(tmp_path)
        a = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.minhash_lsh_dedup(sf, threshold=0.5).take_all()
        )
        b = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.minhash_lsh_dedup(
                sf, threshold=0.5, cc_rows_per_bucket=4
            ).take_all()
        )
        assert a == b and len(a) > 0

    def test_minhash_no_duplicates_empty_result(self, tmp_path):
        """A corpus with no near-dups flows through the whole verify chain
        (empty pair groups, empty CC) and yields a typed empty result."""
        import pyarrow.parquet as _pq

        rows = [
            {
                "doc_id": i,
                "text": " ".join(f"uniq{i}w{j}" for j in range(30)),
                "lang": "en",
                "source": "s",
                "n_chars": 1,
            }
            for i in range(8)
        ]
        d = tmp_path / "uniq"
        d.mkdir()
        _pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        out = dd.minhash_lsh_dedup(str(d), threshold=0.5)
        assert out.take_all() == []
        assert dd.simhash_dedup(str(d), max_hamming=0).take_all() == []

    def test_sf0001_dedup_goldens(self):
        """Round-1 outputs pinned byte-for-byte: the distributed tail must
        keep producing exactly what the driver-side union-find produced.
        Regenerate ONLY for an intentional spec change."""
        import hashlib

        for fn, n, h in [
            (dd.minhash_lsh_dedup, 45,
             "bc7e4ef89384a35581afe67f231eebde024e323488b822bfd456439e82fe61d5"),
            (dd.simhash_dedup, 256,
             "0a04d3a7bf9a432503826de00238d296a523a413775f7523c00e2d0611df248c"),
        ]:
            rows = fn("/root/testdata/sf0.001").take_all()
            got = hashlib.sha256(
                str([(r["doc_id"], r["cluster_id"]) for r in rows]).encode()
            ).hexdigest()
            assert (len(rows), got) == (n, h), fn.__name__

    def test_connected_components_random_graphs(self):
        """Multi-bucket CC vs an in-test union-find reference on seeded
        random graphs (mix of chains, cliques, isolated pairs)."""
        import numpy as np
        import pyarrow as _pa
        import ray.data as rd

        from ocr_engine_ray.pipelines.graph import connected_components

        rng = np.random.default_rng(7)
        for trial in range(3):
            n_nodes = 200
            edges = rng.integers(0, n_nodes, size=(150, 2))
            edges = edges[edges[:, 0] != edges[:, 1]]
            a = edges[:, 0].astype("int64")
            b = edges[:, 1].astype("int64")
            # reference union-find
            parent = list(range(n_nodes))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for x, y in zip(a, b):
                rx, ry = find(int(x)), find(int(y))
                if rx != ry:
                    parent[max(rx, ry)] = min(rx, ry)
            expected = {}
            for x in set(a) | set(b):
                expected[int(x)] = find(int(x))
            ds = rd.from_arrow(
                _pa.table({"a": _pa.array(a), "b": _pa.array(b)})
            )
            got = {
                r["doc_id"]: r["cluster_id"]
                for r in connected_components(ds, num_partitions=5).take_all()
            }
            assert got == expected, f"trial {trial}"

    def test_connected_components_empty(self):
        import pyarrow as _pa
        import ray.data as rd

        from ocr_engine_ray.pipelines.graph import connected_components

        edges = rd.from_arrow(
            _pa.table({"a": _pa.array([], _pa.int64()), "b": _pa.array([], _pa.int64())})
        )
        assert connected_components(edges).take_all() == []


@pytest.mark.usefixtures("ray_session")
class TestAnn:
    def test_bruteforce_matches_numpy(self, tmp_path):
        sf = _write_corpus(tmp_path)
        got = dd and annp.ann_topk_bruteforce(sf, num_queries=3, k=4).take_all()
        # numpy reference
        t = pq.read_table(f"{sf}/embeddings.parquet")
        ids = np.array(t.column("vec_id").to_pylist())
        m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        m = m / np.linalg.norm(m, axis=1)[:, None]
        order = np.argsort(ids)
        q = order[:3]
        exp = {}
        for qi in q:
            sims = m @ m[qi]
            sims[qi] = -np.inf
            top = sorted(zip(-sims, ids), key=lambda x: (x[0], x[1]))[:4]
            exp[int(ids[qi])] = [int(v) for _, v in top]
        by_q = {}
        for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
            by_q.setdefault(r["query_id"], []).append(r["vec_id"])
        assert by_q == exp

    def test_ivf_recall_of_planted_neighbor(self, tmp_path):
        sf = _write_corpus(tmp_path)
        rows = annp.ann_topk_ivf(
            sf, num_queries=3, k=4, n_centroids=4, nprobe=2, iters=2
        ).take_all()
        # the planted near-copy (vec 30) shares query 0's k-means list
        q0 = [r["vec_id"] for r in rows if r["query_id"] == 0]
        assert 30 in q0
        for r in rows:
            assert r["rank"] >= 1 and r["vec_id"] != r["query_id"]

    def test_lsh_returns_valid_subset(self, tmp_path):
        sf = _write_corpus(tmp_path)
        rows = annp.ann_topk_lsh(sf, num_queries=3, k=4).take_all()
        # near-copy vec 30 must be found for query 0 (same bucket by construction)
        q0 = [r["vec_id"] for r in rows if r["query_id"] == 0]
        assert 30 in q0
        for r in rows:
            assert r["rank"] >= 1 and r["vec_id"] != r["query_id"]


# ---------------------------------------------------------------- multimodal


class TestMultimodal:
    def test_fake_meta_formula(self):
        from ocr_engine_ray import spec

        w, h, fmt = fake_image_meta("media://doc-00000081/2")
        assert w == 320 + spec.h32(81, 79) % 1280
        assert h == 240 + spec.h32(81, 179) % 800
        assert fmt == "png"

    def test_decoder_batch(self):
        dec = MediaDecoder(use_fake=True)
        batch = pa.table(
            {
                "doc_id": pa.array(["doc-00000081"], pa.string()),
                "media_ref": pa.array(["media://doc-00000081/0"], pa.string()),
            }
        )
        out = dec(batch)
        assert out.column("width")[0].as_py() >= 320
        assert out.column("media_idx")[0].as_py() == 0

    def test_real_decode_unavailable(self):
        with pytest.raises(NotImplementedError):
            MediaDecoder(use_fake=False)

    def test_thumbnail_dims(self):
        assert thumbnail_dims(100, 50) == (100, 50)
        assert thumbnail_dims(512, 256) == (256, 128)
        assert thumbnail_dims(256, 512) == (128, 256)

    def test_frame_sample_plan(self):
        idx = frame_sample_plan(100, 30.0, 10.0)
        assert idx[0] == 0 and len(idx) == 34 and (np.diff(idx) > 0).all()
        assert (frame_sample_plan(10, 30.0, 60.0) == np.arange(10)).all()


@pytest.mark.usefixtures("ray_session")
class TestKmeans:
    def test_deterministic_and_groups_near_dups(self, tmp_path):
        sf = _write_corpus(tmp_path)
        a = annp.embedding_kmeans(sf, k=4, iters=3).to_pandas()
        b = annp.embedding_kmeans(sf, k=4, iters=3).to_pandas()
        assert a.equals(b)  # pure function of the data
        cl = dict(zip(a["vec_id"], a["cluster"]))
        assert len(cl) == 32
        # near-copies must land in the same cluster as their source
        assert cl[0] == cl[30] and cl[1] == cl[31]


class TestIntBloom:
    def test_no_false_negatives_and_low_fp(self):
        import numpy as np

        from ocr_engine_ray.functions.sketch import IntBloom

        rng = np.random.default_rng(7)
        members = rng.choice(1 << 40, size=20_000, replace=False).astype(np.int64)
        bloom = IntBloom.from_ids(members, fp_rate=1e-3)
        assert bloom.contains(members).all()  # zero false negatives, always
        probes = rng.choice(1 << 40, size=50_000, replace=False).astype(np.int64)
        outsiders = probes[~np.isin(probes, members)]
        fp = bloom.contains(outsiders).mean()
        assert fp < 5e-3, fp

    def test_empty_inputs(self):
        import numpy as np

        from ocr_engine_ray.functions.sketch import IntBloom

        bloom = IntBloom.from_ids(np.array([1, 2, 3], dtype=np.int64))
        assert bloom.contains(np.array([], dtype=np.int64)).shape == (0,)

    def test_distributed_build_bit_identical(self, ray_session):
        """The on-cluster chunked-OR build produces the SAME bitmap as the
        local from_ids build when sized identically: positions are a pure
        function of (m, k) and OR is order-independent, so block layout
        cannot change a single bit."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from ocr_engine_ray.functions.sketch import IntBloom
        from ocr_engine_ray.pipelines.dedup import _distributed_bloom

        rng = np.random.default_rng(11)
        a = rng.choice(1 << 40, size=3_000, replace=False).astype(np.int64)
        b = rng.choice(1 << 40, size=3_000, replace=False).astype(np.int64)
        pairs = rd.from_arrow(
            pa.table({"a": pa.array(a), "b": pa.array(b)})
        ).repartition(7)
        ids = np.unique(np.concatenate([a, b]))
        dist = _distributed_bloom(pairs, n_bound=len(ids))
        local = IntBloom.from_ids(ids)
        assert dist.k == local.k and dist.m == local.m
        assert np.array_equal(dist.bits, local.bits)


@pytest.mark.usefixtures("ray_session")
class TestMinhashBloomPath:
    def test_bloom_filtered_identical(self, tmp_path):
        """Forcing the Bloom candidate representation (bloom_threshold=0)
        must give the identical clustering as the exact-set broadcast —
        false positives are wasted shingling, never output changes."""
        sf = _write_corpus(tmp_path)
        a = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.minhash_lsh_dedup(sf, threshold=0.5).take_all()
        )
        b = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.minhash_lsh_dedup(
                sf, threshold=0.5, bloom_threshold=0
            ).take_all()
        )
        assert a == b and len(a) > 0

    def test_prune_off_identical(self, tmp_path):
        """prune_candidates=False (the escape hatch for candidate sets too
        large to broadcast: pure semi-join shuffle, r2 behavior) must give
        the identical clustering."""
        sf = _write_corpus(tmp_path)
        a = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.minhash_lsh_dedup(sf, threshold=0.5).take_all()
        )
        b = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.minhash_lsh_dedup(
                sf, threshold=0.5, prune_candidates=False
            ).take_all()
        )
        assert a == b and len(a) > 0


@pytest.mark.usefixtures("ray_session")
class TestWinnowNearDup:
    def test_containment_and_exact_dup(self, tmp_path):
        """Winnowing links exact dups AND containment (a doc pasted inside a
        larger one) — the case MinHash whole-doc Jaccard misses."""
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        base = (
            "the quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill in the afternoon sun"
        )
        texts = [
            base,                                    # 0
            base,                                    # 1 exact dup of 0
            base + " " + "totally different trailing content " * 12,  # 2 contains 0
            "completely unrelated text about databases and query engines "
            "optimizing distributed shuffles at scale every day",      # 3
        ]
        d = tmp_path / "winnow_sf"
        d.mkdir()
        _pq.write_table(
            _pa.table(
                {
                    "doc_id": _pa.array(range(len(texts)), _pa.int64()),
                    "text": _pa.array(texts, _pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        rows = dd.winnow_near_dup(str(d), overlap=0.5).take_all()
        cl = {r["doc_id"]: r["cluster_id"] for r in rows}
        assert cl.get(0) == cl.get(1) == cl.get(2) == 0
        assert 3 not in cl

    def test_no_dups_empty(self, tmp_path):
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        d = tmp_path / "winnow_clean"
        d.mkdir()
        _pq.write_table(
            _pa.table(
                {
                    "doc_id": _pa.array([0, 1], _pa.int64()),
                    "text": _pa.array(
                        [
                            "alpha beta gamma delta epsilon zeta eta theta",
                            "one two three four five six seven eight nine",
                        ],
                        _pa.string(),
                    ),
                }
            ),
            str(d / "documents.parquet"),
        )
        assert dd.winnow_near_dup(str(d), overlap=0.5).count() == 0


@pytest.mark.usefixtures("ray_session")
class TestSemanticDedup:
    def test_planted_near_copies_dropped_keep_first(self, tmp_path):
        sf = _write_corpus(tmp_path)
        rows = dd.semantic_dedup(sf, threshold=0.95, num_clusters=3, iters=3).take_all()
        kept = {r["vec_id"] for r in rows}
        # vec 30 ≈ vec 0 and vec 31 ≈ vec 1 (cos ≈ 0.9999); keep-first
        # retains the lower vec_id of each pair
        assert 0 in kept and 1 in kept
        assert 30 not in kept and 31 not in kept
        # independent random unit vectors never reach cos 0.95
        assert kept == set(range(30))

    def test_threshold_above_one_keeps_all(self, tmp_path):
        sf = _write_corpus(tmp_path)
        rows = dd.semantic_dedup(sf, threshold=1.01, num_clusters=3, iters=2).take_all()
        assert [r["vec_id"] for r in rows] == list(range(32))

    def test_deterministic(self, tmp_path):
        sf = _write_corpus(tmp_path)
        a = dd.semantic_dedup(sf, threshold=0.95, num_clusters=3).take_all()
        b = dd.semantic_dedup(sf, threshold=0.95, num_clusters=3).take_all()
        assert a == b


class TestMidpointRounding:
    """Regression: pc.round defaults to half-to-even while DuckDB round()
    is half-away — averages over power-of-two counts can land exactly on a
    binary midpoint, where the two modes disagree.  Both finish-stage
    rounds now pass half_towards_infinity; these pin it e2e vs DuckDB."""

    def test_pricing_avg_qty_midpoint(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as entry
        from ocr_engine_ray.pipelines.analytics import pricing_summary

        # 8 rows of qty 3.125 avg: sum 25.0, avg 25/8 = 3.125 (exact binary
        # midpoint at 2 decimals) -> half-away gives 3.13, half-even 3.12
        rows = [
            {
                "l_orderkey": i, "l_partkey": 1, "l_suppkey": 1,
                "l_linenumber": 1, "l_quantity": 3.125,
                "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
                "l_returnflag": "A", "l_linestatus": "F",
            }
            for i in range(8)
        ]
        t = pa.Table.from_pylist(rows)
        t = t.set_column(
            t.schema.get_field_index("l_linenumber"),
            "l_linenumber",
            t.column("l_linenumber").cast(pa.int32()),
        )
        d = tmp_path / "li"
        d.mkdir()
        pq.write_table(t, str(d / "lineitem.parquet"))
        got = pricing_summary(str(d)).take_all()
        assert len(got) == 1 and got[0]["avg_qty"] == 3.13
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
        )
        want = con.execute(entry.oracle_sql()["pricing_summary"]).fetchone()
        assert got[0]["avg_qty"] == want[5]  # avg_qty column

    def test_quality_avg_chars_midpoint(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as entry
        from ocr_engine_ray.pipelines.textstats import quality_by_source

        # 32 docs, total chars = 33*16+1... craft avg_chars with a binary
        # midpoint at 4 decimals: avg = k + 5/16? Use 2 docs, lengths 1 and
        # 2 -> avg 1.5 (no midpoint at 4dp).  Simplest true midpoint:
        # 16 docs, total chars = 16*c + 8 -> avg = c + 0.5... still not 4dp.
        # 4dp midpoint needs avg*10^4 = n + 0.5 exactly representable:
        # avg = 1.00005 is NOT binary-exact; use avg = 1 + 9/16384? Instead
        # pin the mechanism directly: 8 docs averaging 0.8125 tokens
        # (13/16 = binary exact, 4dp round: half-away 0.8125 stays) — and
        # assert Ray == DuckDB on a power-of-two corpus where pc.round's
        # default was historically risky.
        rows = []
        for i in range(16):
            # 5 docs with 1 token, 11 empty: avg_tokens = 5/16 = 0.3125
            rows.append(
                {
                    "doc_id": i,
                    "text": "x" if i < 5 else "",
                    "lang": "en",
                    "source": "s",
                    "n_chars": 0,
                }
            )
        d = tmp_path / "q"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = quality_by_source(str(d)).take_all()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = con.execute(entry.oracle_sql()["quality_by_source"]).fetchone()
        assert got[0]["avg_tokens"] == want[2]
        assert got[0]["avg_chars"] == want[1]


class TestAudioWindowPlan:
    def test_framing_arithmetic(self):
        import numpy as np

        from ocr_engine_ray.stages.multimodal import audio_window_plan

        # 1 s @16 kHz, 25 ms / 10 ms -> win 400, hop 160, 100 frames
        plan = audio_window_plan(16000, 16000)
        assert plan.shape[1] == 2 and len(plan) == 100
        assert plan[0].tolist() == [0, 400]
        assert plan[1].tolist() == [160, 400]
        # tail windows truncate instead of over-running the signal
        assert (plan[:, 0] + plan[:, 1] <= 16000).all()
        assert plan[-1, 1] < 400
        # full coverage, hop-regular starts
        assert (np.diff(plan[:, 0]) == 160).all()

    def test_edges(self):
        import pytest

        from ocr_engine_ray.stages.multimodal import audio_window_plan

        assert len(audio_window_plan(0, 16000)) == 0
        assert audio_window_plan(10, 16000)[0].tolist() == [0, 10]  # shorter than one window
        with pytest.raises(ValueError):
            audio_window_plan(100, 0)
        with pytest.raises(ValueError):
            audio_window_plan(100, 16000, hop_ms=0)


class TestTokenOccurrences:
    """The vectorized `_token_occurrences` / `doc_token_counts_batch`
    primitives must be value-identical to per-doc `_py_tokens` /
    `Counter(_py_tokens(t))` — they replaced those loops in
    token_frequencies, tfidf_top_terms, token_rarity_score and
    heavy_hitters."""

    def test_hypothesis_counter_equivalence(self):
        from collections import Counter

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ocr_engine_ray.pipelines import textstats as T

        @settings(max_examples=200, deadline=None)
        @given(
            st.lists(
                st.one_of(
                    st.none(),
                    st.text(
                        alphabet=st.characters(
                            codec="utf-8", exclude_characters=["\x00"]
                        ),
                        max_size=60,
                    ),
                ),
                max_size=10,
            )
        )
        def check(texts):
            rows, codes, cnt, dic = T.doc_token_counts_batch(texts)
            toks = dic.to_pylist()
            for i, t in enumerate(texts):
                want = dict(Counter(T._py_tokens(t)))
                got = {
                    toks[c]: n
                    for r, c, n in zip(rows.tolist(), codes.tolist(), cnt.tolist())
                    if r == i
                }
                assert got == want, (i, t)

        check()


class TestBatchSignals:
    """quality_scores_batch / langid_batch must be bit-identical to the
    scalar functions they replaced in doc_stats, rank_by_quality,
    curate_corpus and langid_counts."""

    def test_hypothesis_quality_equivalence(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ocr_engine_ray.functions import textstats as fts
        from ocr_engine_ray.pipelines import textstats as T

        @settings(max_examples=200, deadline=None)
        @given(
            st.lists(
                st.one_of(
                    st.none(),
                    st.text(
                        alphabet=st.characters(
                            codec="utf-8", exclude_characters=["\x00"]
                        ),
                        max_size=80,
                    ),
                    st.sampled_from([
                        "the quick fox", "der und das ist", "el la de que",
                        "一 two", "क ख", "a" * 30, "1 2 3 !!!",
                    ]),
                ),
                max_size=10,
            )
        )
        def check(texts):
            got_q = T.quality_scores_batch(texts)
            want_q = [fts.quality_score(t or "") for t in texts]
            assert got_q == want_q
            got_l = T.langid_batch(texts)
            want_l = [fts.langid(t or "") for t in texts]
            assert got_l == want_l

        check()

    def test_bpe_count_kernel_equivalence(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        import pyarrow as pa
        import pyarrow.compute as pc

        from ocr_engine_ray.functions import textstats as fts

        @settings(max_examples=150, deadline=None)
        @given(st.lists(st.text(max_size=60), max_size=8))
        def check(texts):
            arr = pa.array(texts, pa.string())
            got = pc.count_substring_regex(arr, fts.BPE_ISH_RE.pattern).to_pylist()
            want = [fts.token_count_bpe_ish(t) for t in texts]
            assert got == want

        check()


@pytest.mark.usefixtures("ray_session")
class TestMinhashExactCollapse:
    """collapse_exact=True (the crawl-scale path: sha1-collapse exact dups
    before banding, expand labels back through the groups) must produce
    byte-identical output to the direct path whenever bucket caps don't
    bite — including exact-only clusters (a duplicated text whose rep has
    no near-dup partner) and near-dup links between a rep and a singleton."""

    def _corpus(self, tmp_path):
        import pyarrow.parquet as _pq

        base = [
            "alpha beta gamma delta epsilon zeta "
            + " ".join(f"w{i}{j}" for j in range(20))
            for i in range(6)
        ]
        rows = []
        i = 0
        for _rep in range(5):  # 5 exact copies of each of 6 texts
            for t in base:
                rows.append(
                    {"doc_id": i, "text": t, "lang": "en", "source": "s",
                     "n_chars": len(t)}
                )
                i += 1
        rows.append(  # near-dup of base[0], singleton
            {"doc_id": i, "text": base[0] + " extraword", "lang": "en",
             "source": "s", "n_chars": 1}
        )
        i += 1
        rows.append(  # unrelated singleton: must appear in NEITHER output
            {"doc_id": i, "text": "totally different content here entirely unique",
             "lang": "en", "source": "s", "n_chars": 1}
        )
        d = tmp_path / "collapse"
        d.mkdir()
        _pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        return str(d), i

    def test_byte_identical_to_direct(self, tmp_path):
        sf, lone = self._corpus(tmp_path)
        a = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.minhash_lsh_dedup(sf, threshold=0.5).take_all()
        )
        b = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.minhash_lsh_dedup(
                sf, threshold=0.5, collapse_exact=True
            ).take_all()
        )
        assert a == b and len(a) == 31  # 30 copies + the near-dup; lone absent
        assert lone not in {x for x, _ in b}
        cl = dict(b)
        # the near-dup singleton joins base[0]'s exact cluster
        assert cl[30] == cl[0] == 0
        # an exact-only group (base[1]'s copies) clusters on its rep
        assert cl[1] == cl[7] == cl[13] == cl[19] == cl[25] == 1

    def test_simhash_collapse_byte_identical(self, tmp_path):
        sf, lone = self._corpus(tmp_path)
        a = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.simhash_dedup(sf, max_hamming=3).take_all()
        )
        b = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.simhash_dedup(
                sf, max_hamming=3, collapse_exact=True
            ).take_all()
        )
        assert a == b and len(a) >= 30  # every exact group clusters
        assert lone not in {x for x, _ in b}

    def test_winnow_collapse_byte_identical(self, tmp_path):
        sf, lone = self._corpus(tmp_path)
        a = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.winnow_near_dup(sf).take_all()
        )
        b = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.winnow_near_dup(sf, collapse_exact=True).take_all()
        )
        assert a == b and len(a) >= 30
        assert lone not in {x for x, _ in b}


class TestWinnowVectorized:
    """winnow_fingerprint_np / rolling_hashes_np must be value-identical to
    the scalar references they replaced in winnow_near_dup's fp map."""

    def test_hypothesis_equivalence(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(st.text(max_size=200), st.integers(2, 10), st.integers(2, 24))
        def check(t, k, w):
            assert (
                ts.winnow_fingerprint_np(t, k=k, window=w).tolist()
                == ts.winnow_fingerprint(t, k=k, window=w)
            )
            assert ts.rolling_hashes_np(t, k).tolist() == ts.rolling_hashes(t, k)

        check()

    def test_collapse_no_duplicates_empty_result(self, tmp_path):
        """collapse_exact on a corpus with neither exact nor near dups must
        flow an EMPTY cluster side through the expand join and yield a
        typed empty result, like the direct path."""
        import pyarrow.parquet as _pq

        rows = [
            {"doc_id": i, "text": " ".join(f"uniq{i}w{j}" for j in range(30)),
             "lang": "en", "source": "s", "n_chars": 1}
            for i in range(8)
        ]
        d = tmp_path / "nodup"
        d.mkdir()
        _pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        out = dd.minhash_lsh_dedup(str(d), collapse_exact=True).take_all()
        assert out == []

    def test_winnow_collapse_empty_text_dups_not_emitted(self, tmp_path):
        """Duplicated texts that normalize to '' have EMPTY fingerprint
        sets: the direct path never emits them, so the collapse path's
        twin fallback must mask them out (byte-identical contract)."""
        import pyarrow.parquet as _pq

        rows = [
            {"doc_id": 0, "text": "", "lang": "en", "source": "s", "n_chars": 0},
            {"doc_id": 1, "text": "", "lang": "en", "source": "s", "n_chars": 0},
            {"doc_id": 2, "text": " \t\n", "lang": "en", "source": "s", "n_chars": 3},
            {"doc_id": 3, "text": " \t\n", "lang": "en", "source": "s", "n_chars": 3},
            {"doc_id": 4, "text": "real content words here", "lang": "en",
             "source": "s", "n_chars": 23},
            {"doc_id": 5, "text": "real content words here", "lang": "en",
             "source": "s", "n_chars": 23},
        ]
        d = tmp_path / "emptywin"
        d.mkdir()
        _pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        a = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.winnow_near_dup(str(d)).take_all()
        )
        b = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dd.winnow_near_dup(str(d), collapse_exact=True).take_all()
        )
        assert a == b == [(4, 4), (5, 4)]
        # minhash/simhash DO emit empty-text dup clusters on both paths
        for fn in (dd.minhash_lsh_dedup, dd.simhash_dedup):
            x = sorted((r["doc_id"], r["cluster_id"]) for r in fn(str(d)).take_all())
            y = sorted(
                (r["doc_id"], r["cluster_id"])
                for r in fn(str(d), collapse_exact=True).take_all()
            )
            assert x == y and (0, 0) in x and (1, 0) in x


@pytest.mark.usefixtures("ray_session")
class TestNullLangTokenFrequencies:
    def test_null_lang_row_survives(self, tmp_path):
        """A null lang must become its own (NULL, token) group like the old
        Counter path — not a garbage int64 key from a masked null index."""
        import pyarrow.parquet as _pq

        from ocr_engine_ray.pipelines import textstats as T

        rows = [
            {"doc_id": 0, "text": "aa bb", "lang": "en", "source": "s", "n_chars": 5},
            {"doc_id": 1, "text": "aa", "lang": None, "source": "s", "n_chars": 2},
        ]
        d = tmp_path / "nulllang"
        d.mkdir()
        _pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = [
            (r["lang"], r["token"], r["n_occurrences"])
            for r in T.token_frequencies(str(d)).take_all()
        ]
        assert (None, "aa", 1) in got
        assert ("en", "aa", 1) in got and ("en", "bb", 1) in got

    def test_lone_surrogate_parity(self):
        """The scalar reference hashes lone surrogates (ord() is defined);
        the vectorized path must not raise on them (utf-32 surrogatepass)."""
        t = "ab\ud800cd efgh more text"
        assert ts.rolling_hashes_np(t, 4).tolist() == ts.rolling_hashes(t, 4)
        assert (
            ts.winnow_fingerprint_np(t, 4, 6).tolist()
            == ts.winnow_fingerprint(t, 4, 6)
        )


@pytest.mark.usefixtures("ray_session")
class TestExpandExactGroups:
    def test_randomized_vs_naive(self):
        """_expand_exact_groups must equal the obvious per-row rule on
        randomized group structures: label = cc_label(rep) if the rep is
        clustered, else rep if the doc's group is a twin group, else drop."""
        import ray.data as rd

        rng = np.random.default_rng(11)
        for trial in range(3):
            n_groups = int(rng.integers(3, 30))
            mapping_rows, cluster_rows = [], []
            next_doc = 0
            want = []
            for g in range(n_groups):
                size = int(rng.integers(1, 5))
                ids = list(range(next_doc, next_doc + size))
                next_doc += size + int(rng.integers(0, 3))
                rep = ids[0]
                twin = size >= 2
                clustered = bool(rng.integers(0, 2))
                label = rep - int(rng.integers(0, 2)) if clustered else None
                if clustered:
                    cluster_rows.append({"doc_id": rep, "cluster_id": label})
                for d in ids:
                    mapping_rows.append({"doc_id": d, "rep": rep, "twin": twin})
                    if clustered:
                        want.append((d, label))
                    elif twin:
                        want.append((d, rep))
            clusters = rd.from_items(cluster_rows) if cluster_rows else rd.from_arrow(
                pa.table(
                    {"doc_id": pa.array([], pa.int64()),
                     "cluster_id": pa.array([], pa.int64())}
                )
            )
            mapping = rd.from_items(mapping_rows)
            got = sorted(
                (r["doc_id"], r["cluster_id"])
                for r in dd._expand_exact_groups(clusters, mapping, 8).take_all()
            )
            assert got == sorted(want), f"trial {trial}"


class TestCountMinSketch:
    def test_bucket_hash_matches_sql_kernel(self):
        # the md5-substr bucket expression the DuckDB twin runs, in Python
        import hashlib

        from ocr_engine_ray.pipelines.textstats import _cms_buckets

        toks = ["hello", "a", "scan", "日本語"]
        got = _cms_buckets(toks, 4, 256)
        for ti, tok in enumerate(toks):
            for j in range(4):
                want = (
                    int(hashlib.md5(f"{j}:{tok}".encode()).hexdigest()[:8], 16) % 256
                )
                assert got[j, ti] == want

    def test_estimate_upper_bounds_exact(self, ray_session):
        from ocr_engine_ray.pipelines.textstats import cms_token_counts

        t = cms_token_counts("/root/testdata/sf0.001")
        exact = t.column("exact_n").to_pylist()
        est = t.column("est_n").to_pylist()
        assert len(exact) == 20
        assert all(e >= x for e, x in zip(est, exact))  # CMS never undercounts
        assert exact == sorted(exact, reverse=True)


class TestAudioFramer:
    def test_real_wav_decode_through_actor_stage(self, ray_session):
        # the REAL decode path is live in this container (stdlib wave):
        # synthesize WAV payloads, run them through the map_batches stage
        import io
        import struct
        import wave

        import ray.data as rd

        from ocr_engine_ray.stages.multimodal import AudioFramer, audio_window_plan

        def wav_bytes(n_samples: int, rate: int) -> bytes:
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(rate)
                w.writeframes(struct.pack(f"<{n_samples}h", *([0] * n_samples)))
            return buf.getvalue()

        rows = [
            {"doc_id": 1, "media_blob": wav_bytes(16000, 16000)},  # 1 s
            {"doc_id": 2, "media_blob": wav_bytes(123, 8000)},  # sub-window
            {"doc_id": 3, "media_blob": wav_bytes(4001, 16000)},  # ragged tail
        ]
        out = {
            r["doc_id"]: r
            for r in rd.from_items(rows)
            .map_batches(
                lambda b: AudioFramer(use_fake=False)(b), batch_format="pyarrow"
            )
            .take_all()
        }
        assert out[1]["n_samples"] == 16000 and out[1]["sample_rate"] == 16000
        assert out[1]["n_frames"] == len(audio_window_plan(16000, 16000))
        assert out[2]["n_samples"] == 123 and out[2]["sample_rate"] == 8000
        plan2 = audio_window_plan(123, 8000)  # win=200 > signal, hop=80: 2 frames
        assert out[2]["n_frames"] == len(plan2) == 2
        assert out[2]["framed_samples"] == int(plan2[:, 1].sum()) == 123 + 43
        # ragged tail: last window truncated, totals add up
        plan = audio_window_plan(4001, 16000)
        assert out[3]["n_frames"] == len(plan)
        assert out[3]["framed_samples"] == int(plan[:, 1].sum())

    def test_fake_matches_sql_arithmetic(self):
        from ocr_engine_ray import spec
        from ocr_engine_ray.stages.multimodal import fake_audio_samples

        for num in (0, 7, 99, 12345):
            want = 8000 + ((num + 501) * 2654435761) % 4294967296 % 160000
            assert fake_audio_samples(num) == want
            assert fake_audio_samples(num) == 8000 + spec.h32(num, 501) % 160000


class TestVideoFrameSampler:
    def test_plan_totals_through_actor_stage(self, ray_session):
        import numpy as np
        import ray.data as rd

        from ocr_engine_ray.stages.multimodal import (
            VideoFrameSampler,
            fake_video_frames,
            frame_sample_plan,
        )

        rows = [{"doc_id": d} for d in (10, 113, 9917)]
        out = {
            r["doc_id"]: r
            for r in rd.from_items(rows)
            .map_batches(VideoFrameSampler, batch_format="pyarrow", concurrency=1)
            .take_all()
        }
        for d in (10, 113, 9917):
            n = fake_video_frames(d)
            idx = frame_sample_plan(n, 30.0, 4.0)
            assert out[d]["n_frames"] == n
            assert out[d]["n_kept"] == len(idx)
            assert out[d]["first_kept"] == int(idx[0])
            assert out[d]["last_kept"] == int(idx[-1])
            # decimation keeps ~4/30 of frames
            assert abs(len(idx) - n * 4 / 30) <= 1

    def test_real_probe_is_an_honest_seam(self):
        import pytest as _pytest

        from ocr_engine_ray.stages.multimodal import VideoFrameSampler

        with _pytest.raises(NotImplementedError):
            VideoFrameSampler._probe_real(b"\x00\x00")


class TestBigramLogprob:
    def test_bucket_count_invariance(self, ray_session):
        # the w1-bucket shuffle must not affect the exact integer scores
        from ocr_engine_ray.pipelines.lm import bigram_logprob_score

        a = {
            r["doc_id"]: (r["n_bigrams"], r["logprob_q"], r["avg_logprob"])
            for r in bigram_logprob_score(
                "/root/testdata/sf0.001", num_buckets=3
            ).take_all()
        }
        b = {
            r["doc_id"]: (r["n_bigrams"], r["logprob_q"], r["avg_logprob"])
            for r in bigram_logprob_score(
                "/root/testdata/sf0.001", num_buckets=64
            ).take_all()
        }
        assert a == b and len(a) == 500

    def test_hand_computed_micro_corpus(self, ray_session, tmp_path):
        # corpus: "a b a b" and "a c" -> bigrams (a,b)x2, (b,a)x1, (a,c)x1
        # V=3; c(a,*)=3, c(b,*)=1
        import math

        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines.lm import LM_Q, bigram_logprob_score

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a b a b", "a c"], pa.string()),
                    "lang": pa.array(["en", "en"], pa.string()),
                    "source": pa.array(["s", "s"], pa.string()),
                    "n_chars": pa.array([7, 3], pa.int64()),
                }
            ),
            d / "documents.parquet",
        )
        out = {r["doc_id"]: r for r in bigram_logprob_score(str(d)).take_all()}
        q_ab = round(math.log((2 + 1) / (3 + 3)) * LM_Q)
        q_ba = round(math.log((1 + 1) / (1 + 3)) * LM_Q)
        q_ac = round(math.log((1 + 1) / (3 + 3)) * LM_Q)
        assert out[1]["n_bigrams"] == 3
        assert out[1]["logprob_q"] == 2 * q_ab + q_ba
        assert out[2]["n_bigrams"] == 1
        assert out[2]["logprob_q"] == q_ac
        assert out[2]["avg_logprob"] == round(q_ac / 1 / LM_Q, 6)

    def test_control_char_tokens_stay_distinct_pairs(self, ray_session, tmp_path):
        # \x1f is NOT RE2 whitespace, so tokens can contain it; the pairs
        # ("a\x1f","b") and ("a","\x1fb") must not merge (a string-joined
        # pair key would collide — regression for the integer pair encoding)
        import math

        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_engine_ray.pipelines.lm import LM_Q, bigram_logprob_score

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a\x1f b", "a \x1fb"], pa.string()),
                    "lang": pa.array(["en", "en"], pa.string()),
                    "source": pa.array(["s", "s"], pa.string()),
                    "n_chars": pa.array([4, 4], pa.int64()),
                }
            ),
            d / "documents.parquet",
        )
        out = {r["doc_id"]: r for r in bigram_logprob_score(str(d)).take_all()}
        # V=4 distinct tokens; each bigram unique: c12=1, c(w1,*)=1
        q = round(math.log((1 + 1) / (1 + 4)) * LM_Q)
        assert out[1]["logprob_q"] == q
        assert out[2]["logprob_q"] == q

    def test_perplexity_buckets_are_balanced_thirds(self, ray_session):
        from collections import Counter

        from ocr_engine_ray.pipelines.lm import perplexity_buckets

        rows = perplexity_buckets("/root/testdata/sf0.001").take_all()
        assert len(rows) == 500
        per_src: dict[str, Counter] = {}
        ranks: dict[str, list[int]] = {}
        for r in rows:
            per_src.setdefault(r["source"], Counter())[r["ppl_bucket"]] += 1
            ranks.setdefault(r["source"], []).append(r["rank_in_source"])
        for src, c in per_src.items():
            n = sum(c.values())
            # integer thirds: each bucket holds floor/ceil(n/3)
            assert set(c) <= {"head", "middle", "tail"}
            assert max(c.values()) - min(c.values()) <= 1
            # ranks are a permutation of 1..n (the prefix-sum rank is dense)
            assert sorted(ranks[src]) == list(range(1, n + 1))


class TestPersistedPQCodes:
    def test_decoupled_search_equals_fused_pipeline(self, ray_session, tmp_path):
        # encode once -> write codes parquet -> search FROM the codes table;
        # must equal the fused encode-and-search operator exactly
        import numpy as np
        import ray.data as rd

        from ocr_engine_ray.pipelines.ann import (
            _smallest_rows,
            ann_search_codes,
            ann_topk_ivfpq,
            pq_encode,
        )
        from ocr_engine_ray.sources.tables import sf_table

        sf = "/root/testdata/sf0.001"
        codes_ds, coarse, cbs = pq_encode(sf)
        out = str(tmp_path / "codes")
        codes_ds.write_parquet(out)  # the persisted at-scale artifact

        emb = sf_table(sf, "embeddings", columns=["vec_id", "embedding"])
        qrows = _smallest_rows(emb.materialize(), 8)
        qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
        qraw = np.array([r["embedding"] for r in qrows], dtype=np.float64)

        got = sorted(
            (r["query_id"], r["rank"], r["vec_id"])
            for r in ann_search_codes(
                rd.read_parquet(out), coarse, cbs, qids, qraw
            ).take_all()
        )
        want = sorted(
            (r["query_id"], r["rank"], r["vec_id"])
            for r in ann_topk_ivfpq(sf).take_all()
        )
        assert got == want and len(got) == 40



class TestBucketScoreKernel:
    def test_matches_naive_dict_reference(self):
        # the REAL reduceat/np.unique kernel vs a plain dict reimplementation,
        # over randomized dup-heavy bucket tables (incl. control-char tokens)
        import math

        import numpy as np
        import pyarrow as pa

        from ocr_engine_ray.pipelines.lm import LM_Q, bucket_score_kernel

        rng = np.random.default_rng(11)
        for trial in range(6):
            n = int(rng.integers(5, 200))
            vocab = [f"w{i}" for i in range(int(rng.integers(2, 12)))] + ["x\x1fy"]
            w1 = rng.choice(vocab, size=n)
            w2 = rng.choice(vocab, size=n)
            docs = rng.integers(0, 9, size=n).astype(np.int64)
            cs = rng.integers(1, 5, size=n).astype(np.int64)
            # collapse duplicate (doc, w1, w2) rows like the explode stage does
            agg: dict[tuple[int, str, str], int] = {}
            for d, a, b, c in zip(docs.tolist(), w1.tolist(), w2.tolist(), cs.tolist()):
                agg[(d, a, b)] = agg.get((d, a, b), 0) + c
            rows = sorted(agg.items())
            group = pa.table(
                {
                    "bkt": pa.array([0] * len(rows), pa.int32()),
                    "w1": pa.array([k[1] for k, _ in rows], pa.string()),
                    "w2": pa.array([k[2] for k, _ in rows], pa.string()),
                    "doc_id": pa.array([k[0] for k, _ in rows], pa.int64()),
                    "c": pa.array([v for _, v in rows], pa.int64()),
                }
            )
            V = 7
            c12: dict[tuple[str, str], int] = {}
            c1: dict[str, int] = {}
            for (d, a, b), c in agg.items():
                c12[(a, b)] = c12.get((a, b), 0) + c
                c1[a] = c1.get(a, 0) + c
            want: dict[int, tuple[int, int]] = {}
            for (d, a, b), c in agg.items():
                q = round(math.log((c12[(a, b)] + 1) / (c1[a] + V)) * LM_Q)
                lq, nb = want.get(d, (0, 0))
                want[d] = (lq + c * q, nb + c)
            out = bucket_score_kernel(group, vocab_v=V)
            got = {
                d: (lq, nb)
                for d, lq, nb in zip(
                    out.column("doc_id").to_pylist(),
                    out.column("logprob_q").to_pylist(),
                    out.column("n_bigrams").to_pylist(),
                )
            }
            assert got == want, f"trial {trial}"
