"""Independent single-process oracles for the sketch/dedup surfaces whose
driver gates were rows-only (no ANSI-SQL twin exists for a 64-bit rolling
hash or a MinHash signature).

Like `ocr_engine_ray.oracle` (the per-doc extraction oracle), everything
here is a from-scratch sequential reimplementation of the SPEC — plain
dicts, union-find and per-doc loops — sharing no orchestration code with
the distributed pipelines in `pipelines/dedup.py` / `pipelines/textstats.py`.
The per-doc hash constants (crc32 trigram shingles, rng(42) minhash params,
blake2b band hashes, base-1000003 rolling hash) are duplicated by value:
they are the operator's definition, and a drift on either side breaks the
pinned digests in `tests/test_digest_dedup.py` loudly.

The corpus digests produced by `clusters_digest` are pinned as SQL literals
in `__ray_entry__.oracle_sql()` (`minhash_digest` etc.), turning the
rows-only surfaces into hash-gated CORRECTNESS rows — same pattern as
`rich_fields_digest` (see pipelines/interpret.py:fold_digest).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow.parquet as pq

# --- shared spec constants (duplicated from the pipeline by definition) ----

MERSENNE = (1 << 61) - 1
WORD_RE = re.compile(r"[0-9A-Za-z_]+")  # ASCII class, in lockstep with pipelines
WS_RE = re.compile(r"[ \t\n\f\r]+")
DIGEST_MOD = (1 << 61) - 1


def _load_docs(sf_dir: str) -> list[tuple[int, str]]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return list(
        zip(t.column("doc_id").to_pylist(), [x or "" for x in t.column("text").to_pylist()])
    )


# --- union-find + cluster emission ----------------------------------------


class _UnionFind:
    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        if p != x:
            p = self.parent[x] = self.find(p)
        return p

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def clusters_from_edges(edges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """(a, b) edges → sorted (doc_id, cluster_id=min id of component) rows,
    one row per node that appears in any edge — the sequential twin of
    `pipelines.graph.connected_components`."""
    uf = _UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return sorted((n, uf.find(n)) for n in uf.parent)


def clusters_digest(rows: list[tuple[int, int]]) -> int:
    """Order-independent corpus digest of (doc_id, cluster_id) rows — the
    sequential twin of `pipelines.interpret.fold_digest` over the payload
    str(cluster_id)."""
    s = 0
    for d, c in rows:
        h = hashlib.md5(f"{d}\x1f{c}".encode("utf-8")).digest()
        s = (s + int.from_bytes(h, "big")) % DIGEST_MOD
    return s


# --- MinHash + LSH ---------------------------------------------------------

NUM_HASHES = 64
NUM_BANDS = 16
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
MAX_BUCKET = 64


def shingle_set(text: str, n: int = 3) -> set[int]:
    words = WORD_RE.findall((text or "").lower())
    if len(words) < n:
        return {zlib.crc32(" ".join(words).encode())} if words else set()
    return {zlib.crc32(" ".join(words[i : i + n]).encode()) for i in range(len(words) - n + 1)}


def _minhash_params() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(42)
    a = rng.integers(1, MERSENNE, size=NUM_HASHES, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, MERSENNE, size=NUM_HASHES, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_clusters(sf_dir: str, *, threshold: float = 0.8) -> list[tuple[int, int]]:
    """Sequential MinHash→LSH→exact-Jaccard-verify→union-find clustering."""
    docs = _load_docs(sf_dir)
    A, B = _minhash_params()
    shingles: dict[int, set[int]] = {}
    buckets: dict[tuple[int, str], list[int]] = {}
    for d, t in docs:
        sh = shingle_set(t)
        shingles[d] = sh
        if not sh:
            sig = np.full(NUM_HASHES, np.iinfo(np.uint64).max, dtype=np.uint64)
        else:
            x = np.fromiter(sh, dtype=np.uint64)
            sig = ((np.outer(A, x) + B[:, None]) % MERSENNE).min(axis=1)
        for band in range(NUM_BANDS):
            chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
            bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            buckets.setdefault((band, bh), []).append(d)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(ids)[:MAX_BUCKET]  # same deterministic skew cap as the pipeline
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    edges = []
    for a, b in sorted(pairs):
        s1, s2 = shingles[a], shingles[b]
        if not s1 and not s2:
            j = 1.0
        elif not s1 or not s2:
            j = 0.0
        else:
            inter = len(s1 & s2)
            j = inter / (len(s1) + len(s2) - inter)
        if j >= threshold:
            edges.append((a, b))
    return clusters_from_edges(edges)


def _cross_matches_by_side(
    sf_dir: str, is_new, *, threshold: float
) -> list[tuple[int, int]]:
    """Shared sequential core of `incremental_matches`/`leakage_matches`:
    MinHash→LSH candidate pairs restricted to NEW × OLD cross pairs (side
    given by the ``is_new(doc_id)`` predicate), each side capped at the
    first MAX_BUCKET ascending ids per (band, bhash) bucket, exact-Jaccard
    verify, then MIN matching old id per new doc.  Returns sorted
    (new_doc_id, old_doc_id) rows."""
    docs = _load_docs(sf_dir)
    A, B = _minhash_params()
    shingles: dict[int, set[int]] = {}
    buckets: dict[tuple[int, str], list[int]] = {}
    for d, t in docs:
        sh = shingle_set(t)
        shingles[d] = sh
        if not sh:
            sig = np.full(NUM_HASHES, np.iinfo(np.uint64).max, dtype=np.uint64)
        else:
            x = np.fromiter(sh, dtype=np.uint64)
            sig = ((np.outer(A, x) + B[:, None]) % MERSENNE).min(axis=1)
        for band in range(NUM_BANDS):
            chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
            bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            buckets.setdefault((band, bh), []).append(d)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        new = sorted(i for i in ids if is_new(i))[:MAX_BUCKET]
        old = sorted(i for i in ids if not is_new(i))[:MAX_BUCKET]
        for n in new:
            for o in old:
                pairs.add((n, o))
    best: dict[int, int] = {}
    for n, o in sorted(pairs):
        s1, s2 = shingles[n], shingles[o]
        if not s1 and not s2:
            j = 1.0
        elif not s1 or not s2:
            j = 0.0
        else:
            inter = len(s1 & s2)
            j = inter / (len(s1) + len(s2) - inter)
        if j >= threshold and (n not in best or o < best[n]):
            best[n] = o
    return sorted(best.items())


def incremental_matches(
    sf_dir: str, *, threshold: float = 0.8, split_mod: int = 8
) -> list[tuple[int, int]]:
    """Sequential twin of `pipelines.dedup.incremental_dedup`: NEW side is
    ``doc_id % split_mod == split_mod - 1``."""
    return _cross_matches_by_side(
        sf_dir,
        lambda d: d % split_mod == split_mod - 1,
        threshold=threshold,
    )


def leakage_matches(
    sf_dir: str, *, threshold: float = 0.8, test_frac: float = 0.05
) -> list[tuple[int, int]]:
    """Sequential twin of `pipelines.dedup.split_leakage_audit`: NEW side
    is the `sampling.hash_split` TEST coin (salt 's', ``u >= 1 -
    test_frac``)."""

    def is_test(d: int) -> bool:
        u = (int(hashlib.md5(f"{d}:s".encode()).hexdigest()[:8], 16) + 1) / 4294967297.0
        return u >= 1.0 - test_frac

    return _cross_matches_by_side(sf_dir, is_test, threshold=threshold)


# --- SimHash ----------------------------------------------------------------


def simhash64(text: str) -> int:
    words = WORD_RE.findall((text or "").lower())
    if not words:
        return 0
    sig = 0
    counts = [0] * 64
    for w in set(words):
        f = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
        for bit in range(64):
            counts[bit] += 1 if (f >> bit) & 1 else -1
    for bit in range(64):
        if counts[bit] > 0:
            sig |= 1 << bit
    return sig


def simhash_clusters(sf_dir: str, *, max_hamming: int = 3) -> list[tuple[int, int]]:
    docs = _load_docs(sf_dir)
    sigs = {d: simhash64(t) for d, t in docs}
    buckets: dict[tuple[int, int], list[int]] = {}
    for d, s in sigs.items():
        for band in range(4):
            buckets.setdefault((band, (s >> (16 * band)) & 0xFFFF), []).append(d)
    edges: set[tuple[int, int]] = set()
    for ids in buckets.values():
        rows = sorted((d, sigs[d]) for d in ids)[:MAX_BUCKET]
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if bin(rows[i][1] ^ rows[j][1]).count("1") <= max_hamming:
                    edges.add((rows[i][0], rows[j][0]))
    return clusters_from_edges(sorted(edges))


# --- Winnowing --------------------------------------------------------------

_B = 1000003
_MASK = (1 << 64) - 1


def _poly(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * _B + ord(ch)) & _MASK
    return h


def winnow_fps(text: str, k: int = 8, window: int = 16) -> set[int]:
    s = WS_RE.sub(" ", (text or "").lower()).strip(" ")
    if not s:
        return set()
    if len(s) < k:
        return {_poly(s)}
    hs = [_poly(s[: k])]
    top = pow(_B, k - 1, 1 << 64)
    for i in range(k, len(s)):
        hs.append(((hs[-1] - ord(s[i - k]) * top) * _B + ord(s[i])) & _MASK)
    if len(hs) <= window:
        return {min(hs)}
    out: set[int] = set()
    last = -1
    for i in range(len(hs) - window + 1):
        w = hs[i : i + window]
        m = min(w)
        j = i + w.index(m)
        if j != last:
            out.add(m)
            last = j
    return out


def winnow_clusters(
    sf_dir: str, *, overlap: float = 0.5, k: int = 8, window: int = 16
) -> list[tuple[int, int]]:
    docs = _load_docs(sf_dir)
    fps = {d: winnow_fps(t, k=k, window=window) for d, t in docs}
    nfp = {d: len(s) for d, s in fps.items()}
    by_fp: dict[int, list[int]] = {}
    for d, s in fps.items():
        for fp in s:
            by_fp.setdefault(fp, []).append(d)
    shared: dict[tuple[int, int], int] = {}
    for ids in by_fp.values():
        ids = sorted(ids)[:MAX_BUCKET]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                p = (ids[i], ids[j])
                shared[p] = shared.get(p, 0) + 1
    edges = [
        (a, b) for (a, b), sh in sorted(shared.items()) if sh >= overlap * min(nfp[a], nfp[b])
    ]
    return clusters_from_edges(edges)


# --- HyperLogLog distinct-by-source -----------------------------------------

HLL_P = 12
HLL_M = 1 << HLL_P
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hll_distinct_by_source(sf_dir: str) -> list[tuple[str, int]]:
    """Sequential HLL per source — the register max-fold is associative, so
    one pass over all values equals any merge tree of per-batch sketches.
    md5-64 hashing + exact-integer harmonic sum + floor(est + 0.5), the
    same arithmetic the computed DuckDB twin expresses (registers via
    ``substr(md5(·), 1, 16)``, ``S = Σ 2^(53-r)`` as HUGEINT, one float
    division at the end)."""
    import math

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    regs: dict[str, list[int]] = {}
    for s, txt in zip(t.column("source").to_pylist(), t.column("text").to_pylist()):
        r = regs.setdefault(s, [0] * HLL_M)
        h = int.from_bytes(
            hashlib.md5((txt or "").encode("utf-8")).digest()[:8], "big"
        )
        idx = h >> (64 - HLL_P)
        rest = h & ((1 << (64 - HLL_P)) - 1)
        rank = (64 - HLL_P) - rest.bit_length() + 1
        if rank > r[idx]:
            r[idx] = rank
    out = []
    for s in sorted(regs):
        r = regs[s]
        S = sum(1 << (53 - v) for v in r)
        raw = (
            (0.7213 / (1 + 1.079 / 4096.0)) * 4096 * 4096
            * 9007199254740992.0 / float(S)
        )
        zeros = sum(1 for v in r if v == 0)
        if raw <= 2.5 * 4096 and zeros:
            out.append((s, math.floor(4096.0 * math.log(4096.0 / zeros) + 0.5)))
        else:
            out.append((s, math.floor(raw + 0.5)))
    return out


def hll_digest(rows: list[tuple[str, int]]) -> int:
    s = 0
    for src, n in rows:
        h = hashlib.md5(f"{src}\x1f{n}".encode("utf-8")).digest()
        s = (s + int.from_bytes(h, "big")) % DIGEST_MOD
    return s


# --- LSH-bucketed ANN top-k --------------------------------------------------

LSH_PLANES = 8


def ann_lsh_topk(
    sf_dir: str, *, num_queries: int = 8, k: int = 5
) -> list[tuple[int, int, int]]:
    """Sequential twin of `pipelines.ann.ann_topk_lsh`: queries = the
    ``num_queries`` smallest vec_ids, candidates = corpus vectors whose
    hyperplane bucket is the query's bucket or any Hamming-1 probe of it,
    ranked by (cosine desc, vec_id asc), self excluded.  Output rows
    (query_id, rank, vec_id) — integers only, so the pinned digest is
    immune to last-ulp float drift (the measured adjacent-score gap at
    sf0.01 is ~8e-4, 12 orders of magnitude above BLAS summation noise)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    mn = m / n[:, None]
    rng = np.random.default_rng(1234)
    planes = rng.standard_normal((LSH_PLANES, m.shape[1]))
    signs = (mn @ planes.T) > 0
    buckets = (
        signs.astype(np.uint32) << np.arange(LSH_PLANES, dtype=np.uint32)
    ).sum(axis=1)
    qpos = np.argsort(vid)[:num_queries]
    out: list[tuple[int, int, int]] = []
    for qi in qpos:
        qb = int(buckets[qi])
        probes = {qb} | {qb ^ (1 << p) for p in range(LSH_PLANES)}
        cand = np.nonzero(np.isin(buckets, list(probes)))[0]
        cand = cand[vid[cand] != vid[qi]]
        sims = mn[cand] @ mn[qi]
        ranked = sorted(zip(sims.tolist(), vid[cand].tolist()), key=lambda t: (-t[0], t[1]))
        for rank, (_, v) in enumerate(ranked[:k], start=1):
            out.append((int(vid[qi]), rank, int(v)))
    return sorted(out)


def topk_digest(rows: list[tuple[int, int, int]]) -> int:
    """Digest of (query_id, rank, vec_id) rows: md5 terms keyed by query_id
    with payload 'rank:vec_id' (matches pipelines.ann.ann_lsh_digest)."""
    s = 0
    for q, r, v in rows:
        h = hashlib.md5(f"{q}\x1f{r}:{v}".encode("utf-8")).digest()
        s = (s + int.from_bytes(h, "big")) % DIGEST_MOD
    return s


# --- k-means family (quantized-exact centroids, bit-deterministic) ----------

KMEANS_Q = 1 << 40


def _load_vecs(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(vid)
    return vid[order], m[order]


def kmeans_centroids(sf_dir: str, *, k: int, iters: int) -> np.ndarray:
    """Sequential twin of `pipelines.ann._kmeans_centroids`: seeds are the k
    smallest vec_ids; per-cluster sums accumulate the SAME 2^-40-quantized
    integers (exact, so any summation order gives the pipeline's bits), and
    the centroid division is the same exact-int / exact-int IEEE divide."""
    vid, m = _load_vecs(sf_dir)
    centroids = m[:k].copy()  # vecs are vec_id-sorted; seeds = k smallest ids
    mq = np.round(m * KMEANS_Q).astype(np.int64)
    for _ in range(iters):
        d = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for ci in range(k):
            mask = a == ci
            if mask.any():
                ssum = [int(x) for x in mq[mask].sum(axis=0, dtype=object)]
                n = int(mask.sum())
                centroids[ci] = np.array(
                    [s / (n * KMEANS_Q) for s in ssum], dtype=np.float64
                )
    return centroids


def kmeans_assignments(
    sf_dir: str, *, k: int = 8, iters: int = 4
) -> list[tuple[int, int]]:
    """(vec_id, cluster) rows — twin of `pipelines.ann.embedding_kmeans`."""
    vid, m = _load_vecs(sf_dir)
    c = kmeans_centroids(sf_dir, k=k, iters=iters)
    d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    return sorted(zip(vid.tolist(), d.argmin(axis=1).tolist()))


def semantic_keep(
    sf_dir: str, *, threshold: float = 0.42, num_clusters: int = 8, iters: int = 4
) -> list[tuple[int, int]]:
    """(vec_id, cluster) RETAINED rows — twin of `pipelines.dedup.semantic_dedup`
    (greedy keep-first by vec_id inside each k-means cluster)."""
    vid, m = _load_vecs(sf_dir)
    c = kmeans_centroids(sf_dir, k=num_clusters, iters=iters)
    d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)
    out: list[tuple[int, int]] = []
    for ci in range(num_clusters):
        idx = np.nonzero(a == ci)[0]  # vec_id-sorted already
        # same size cap as the pipeline (dedup.SEMANTIC_MAX_CLUSTER = 4096,
        # restated as a literal to keep the oracle independent): rows past
        # the cap are dropped entirely — absent from the output and from
        # the suppression matrix — so both sides agree on oversized clusters
        # instead of the pinned digest failing loudly.
        idx = idx[:4096]
        if len(idx) == 0:
            continue
        sub = m[idx]
        norms = np.linalg.norm(sub, axis=1)
        norms[norms == 0] = 1.0
        mn = sub / norms[:, None]
        sims = mn @ mn.T
        n = len(idx)
        keep = np.ones(n, dtype=bool)
        later = np.arange(n)
        for i in range(n):
            if keep[i]:
                keep[(later > i) & (sims[i] > threshold)] = False
        out.extend((int(vid[idx[i]]), ci) for i in range(n) if keep[i])
    return sorted(out)


def ivf_topk(
    sf_dir: str,
    *,
    num_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
) -> list[tuple[int, int, int]]:
    """(query_id, rank, vec_id) rows — twin of `pipelines.ann.ann_topk_ivf`
    (probe the nprobe nearest inverted lists, rank by cosine desc, vec_id
    asc, self excluded)."""
    vid, m = _load_vecs(sf_dir)
    c = kmeans_centroids(sf_dir, k=n_centroids, iters=iters)
    d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    lists = d.argmin(axis=1)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    mn = m / norms[:, None]
    out: list[tuple[int, int, int]] = []
    for qi in range(num_queries):  # queries = smallest vec_ids (sorted order)
        probes = set(np.argsort(d[qi])[:nprobe].tolist())
        cand = np.nonzero(np.isin(lists, list(probes)) & (vid != vid[qi]))[0]
        sims = mn[cand] @ mn[qi]
        ranked = sorted(
            zip(sims.tolist(), vid[cand].tolist()), key=lambda t: (-t[0], t[1])
        )
        for rank, (_, v) in enumerate(ranked[:k], start=1):
            out.append((int(vid[qi]), rank, int(v)))
    return sorted(out)


# --- Embedding hyperplane-LSH near-dup --------------------------------------

EMB_LSH_BANDS = 48
EMB_LSH_BITS = 4
EMB_LSH_SEED = 20260817
EMB_LSH_MAX_BUCKET = 512


def embedding_lsh_clusters(
    sf_dir: str, *, threshold: float = 0.42
) -> list[tuple[int, int]]:
    """Sequential twin of `pipelines.dedup.embedding_near_dup_lsh`:
    48 bands x 4 sign bits of seeded random hyperplanes; within each band
    bucket (vec_id-sorted, capped at 512), exact float64 cosine verify at
    ``threshold``; union-find over surviving pairs -> sorted
    (vec_id, cluster_id=min id) rows.

    Digest-pinnable despite floats: measured at sf0.01/sf0.1, the nearest
    |cos - threshold| over all pairs is 3.4e-5 and the nearest hyperplane
    projection to zero is 8.8e-7 — both orders of magnitude above dgemm-vs-
    ddot summation noise (~1e-13 at dim 64), so every sign bit and every
    verify decision is identical between the bucket-matmul pipeline and this
    per-pair scan."""
    vid, m = _load_vecs(sf_dir)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    mn = m / norms[:, None]
    planes = np.random.default_rng(EMB_LSH_SEED).standard_normal(
        (EMB_LSH_BANDS * EMB_LSH_BITS, m.shape[1])
    )
    bits = (mn @ planes.T) > 0
    edges: list[tuple[int, int]] = []
    for b in range(EMB_LSH_BANDS):
        bb = bits[:, b * EMB_LSH_BITS : (b + 1) * EMB_LSH_BITS]
        bv = (bb.astype(np.int64) << np.arange(EMB_LSH_BITS)).sum(axis=1)
        buckets: dict[int, list[int]] = {}
        for i, v in enumerate(bv):
            buckets.setdefault(int(v), []).append(i)
        for idxs in buckets.values():
            if len(idxs) < 2:
                continue
            idxs = sorted(idxs, key=lambda i: vid[i])[:EMB_LSH_MAX_BUCKET]
            for x in range(len(idxs)):
                for y in range(x + 1, len(idxs)):
                    i, j = idxs[x], idxs[y]
                    if float(mn[i] @ mn[j]) >= threshold:
                        edges.append((int(vid[i]), int(vid[j])))
    return clusters_from_edges(edges)


# --- IVF-PQ --------------------------------------------------------------


def pq_codebooks_seq(sf_dir: str, *, m: int = 32, ksub: int = 32, iters: int = 3):
    """Sequential twin of `pipelines.ann._pq_codebooks`: one plain k-means
    per subspace over the normalized vectors, seeds = the normalized
    sub-vectors of the ksub smallest vec_ids, per-code sums accumulated as
    the SAME 2^-40-quantized exact integers (any summation order gives the
    pipeline's bits)."""
    vid, mat = _load_vecs(sf_dir)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mn = mat / norms[:, None]
    dim = mn.shape[1]
    ds = dim // m
    mq = np.round(mn * KMEANS_Q).astype(np.int64)
    cbs = np.stack(
        [mn[:ksub, s * ds : (s + 1) * ds].copy() for s in range(m)]
    )  # vec_id-sorted => first ksub = smallest ids
    for _ in range(iters):
        for s in range(m):
            sub = mn[:, s * ds : (s + 1) * ds]
            d = ((sub[:, None, :] - cbs[s][None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            sq = mq[:, s * ds : (s + 1) * ds]
            for code in range(ksub):
                mask = a == code
                if mask.any():
                    ssum = [int(x) for x in sq[mask].sum(axis=0, dtype=object)]
                    n = int(mask.sum())
                    cbs[s][code] = np.array(
                        [x / (n * KMEANS_Q) for x in ssum], dtype=np.float64
                    )
    return cbs


def ivfpq_topk(
    sf_dir: str,
    *,
    num_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    m: int = 32,
    ksub: int = 32,
    pq_iters: int = 3,
) -> list[tuple[int, int, int]]:
    """(query_id, rank, vec_id) rows — twin of `pipelines.ann.ann_topk_ivfpq`
    (probe the nprobe nearest inverted lists; PQ-encode every candidate;
    score = fixed-order sum over subspaces of the per-query ADC lookup
    table; rank by score desc, vec_id asc, self excluded)."""
    vid, mat = _load_vecs(sf_dir)
    c = kmeans_centroids(sf_dir, k=n_centroids, iters=iters)
    d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    lists = d.argmin(axis=1)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mn = mat / norms[:, None]
    cbs = pq_codebooks_seq(sf_dir, m=m, ksub=ksub, iters=pq_iters)
    ds = cbs.shape[2]
    codes = np.empty((len(vid), m), dtype=np.int64)
    for s in range(m):
        sub = mn[:, s * ds : (s + 1) * ds]
        codes[:, s] = (
            ((sub[:, None, :] - cbs[s][None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        )
    out: list[tuple[int, int, int]] = []
    for qi in range(num_queries):  # queries = smallest vec_ids (sorted order)
        probes = set(np.argsort(d[qi])[:nprobe].tolist())
        cand = np.nonzero(np.isin(lists, list(probes)) & (vid != vid[qi]))[0]
        lut = np.stack(
            [mn[qi, s * ds : (s + 1) * ds] @ cbs[s].T for s in range(m)]
        )  # (m, ksub)
        sims = np.zeros(len(cand), dtype=np.float64)
        for s in range(m):  # same fixed subspace order as the pipeline
            sims += lut[s][codes[cand, s]]
        ranked = sorted(
            zip(sims.tolist(), vid[cand].tolist()), key=lambda t: (-t[0], t[1])
        )
        for rank, (_, v) in enumerate(ranked[:k], start=1):
            out.append((int(vid[qi]), rank, int(v)))
    return sorted(out)


# --- BPE merge training (Sennrich et al. 2016) ------------------------------


def bpe_merges(
    sf_dir: str, num_merges: int = 40, max_vocab_words: int = 65536
) -> list[tuple[int, str, str, int]]:
    """Naive from-scratch BPE trainer: per-doc Counter over the lowercased
    ASCII word tokens of the raw texts, top-``max_vocab_words`` words by
    (freq DESC, word ASC), then the textbook greedy merge loop with full
    pair recount per iteration (tie-break: count DESC, (left, right) ASC).
    Returns (rank, left, right, pair_count) rows."""
    from collections import Counter

    freqs: Counter[str] = Counter()
    for _, text in _load_docs(sf_dir):
        freqs.update(WORD_RE.findall(text.lower()))
    top = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab_words]
    vocab = {tuple(w) + ("</w>",): f for w, f in top}
    out: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for seq, f in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += f
        if not pairs:
            break
        (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for seq, f in vocab.items():
            s: list[str] = []
            i = 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == left and seq[i + 1] == right:
                    s.append(merged)
                    i += 2
                else:
                    s.append(seq[i])
                    i += 1
            new_vocab[tuple(s)] = new_vocab.get(tuple(s), 0) + f
        vocab = new_vocab
        out.append((rank, left, right, int(cnt)))
    return out


def bpe_digest(rows: list[tuple[int, str, str, int]]) -> int:
    s = 0
    for rank, left, right, cnt in rows:
        h = hashlib.md5(f"{rank}\x1f{left}|{right}:{cnt}".encode("utf-8")).digest()
        s = (s + int.from_bytes(h, "big")) % DIGEST_MOD
    return s


def bpe_encode_rows(
    sf_dir: str, num_merges: int = 40, max_vocab_words: int = 65536
) -> list[tuple[int, int, int]]:
    """Naive sequential BPE tokenizer application: train with the naive
    `bpe_merges` loop above, then for every doc and every word apply the
    canonical lowest-rank-first merge procedure (full rescan per step, no
    caching, no vectorization).  Returns (doc_id, n_words, n_subwords)."""
    ranks = {
        (left, right): rank
        for rank, left, right, _cnt in bpe_merges(sf_dir, num_merges, max_vocab_words)
    }

    def encode_len(word: str) -> int:
        seq = list(word) + ["</w>"]
        while len(seq) > 1:
            cand = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(seq, seq[1:]))
                if (a, b) in ranks
            ]
            if not cand:
                break
            rank = min(cand)[0]
            left, right = next(
                (seq[i], seq[i + 1]) for r, i in cand if r == rank
            )
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == left and seq[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return len(seq)

    rows: list[tuple[int, int, int]] = []
    for doc_id, text in _load_docs(sf_dir):
        words = WORD_RE.findall(text.lower())
        rows.append((doc_id, len(words), sum(encode_len(w) for w in words)))
    return rows


def bpe_encode_digest(rows: list[tuple[int, int, int]]) -> int:
    s = 0
    for doc_id, n_words, n_subwords in rows:
        h = hashlib.md5(f"{doc_id}\x1f{n_words}:{n_subwords}".encode("utf-8")).digest()
        s = (s + int.from_bytes(h, "big")) % DIGEST_MOD
    return s


# --- cluster topics (c-TF-IDF over k-means clusters) ------------------------


def cluster_topic_rows(
    sf_dir: str, *, k_clusters: int = 8, iters: int = 5, top_terms: int = 5
) -> list[tuple[int, int, str, int, int, int]]:
    """(cluster, rank, token, tf, df, score_q) rows — sequential twin of
    `pipelines.topics.cluster_topics`: plain dict counting over the
    `kmeans_assignments` clusters, score = tf * round(ln(N/df) * 2^40)
    (np.log bits, banker's round — the quantized-ln contract)."""
    import re
    from collections import Counter

    _ws = re.compile(r"[ \t\n\f\r]+")
    asn = dict(kmeans_assignments(sf_dir, k=k_clusters, iters=iters))
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tf: Counter = Counter()  # (cluster, token) -> occurrences
    df: Counter = Counter()  # token -> docs containing it
    n_docs = 0
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        if did not in asn:
            continue
        n_docs += 1
        c = asn[did]
        toks = [w for w in _ws.split(text or "") if w]
        for tok, cnt in Counter(toks).items():
            tf[(c, tok)] += cnt
            df[tok] += 1
    out: list[tuple[int, int, str, int, int, int]] = []
    for c in sorted({ci for ci, _ in tf}):
        scored = []
        for (ci, tok), f in tf.items():
            if ci != c:
                continue
            idf_q = int(np.round(np.log(float(n_docs) / float(df[tok])) * (1 << 40)))
            scored.append((-(f * idf_q), tok, f, df[tok]))
        scored.sort()
        for rk, (negs, tok, f, dfv) in enumerate(scored[:top_terms], 1):
            out.append((c, rk, tok, f, dfv, -negs))
    return out


def topics_digest(rows: list[tuple[int, int, str, int, int, int]]) -> int:
    """Digest of cluster-topic rows (payload 'rank:token:tf:df:score_q',
    framed by cluster — matches `pipelines.topics.topics_digest`)."""
    s = 0
    for c, rk, tok, f, dfv, sq in rows:
        h = hashlib.md5(f"{c}\x1f{rk}:{tok}:{f}:{dfv}:{sq}".encode("utf-8")).digest()
        s = (s + int.from_bytes(h, "big")) % DIGEST_MOD
    return s


# --- k-core -------------------------------------------------------------------


def kcore_nodes(
    sf_dir: str, *, k: int = 2, min_support: int = 2
) -> list[tuple[int, int]]:
    """Sequential twin of `pipelines.graph.kcore_members`: co-purchase
    edges from an independent DuckDB self-join (the `copurchase_pairs`
    gate SQL), then the textbook in-memory peel.  Returns sorted
    (node, deg_in_core) rows."""
    import duckdb

    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH pc AS (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n
          FROM read_parquet('{sf_dir}/lineitem.parquet') a
          JOIN read_parquet('{sf_dir}/lineitem.parquet') b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
        )
        SELECT p1, p2 FROM pc WHERE n >= {min_support}
        """
    ).fetchall()
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = set(adj)
    changed = True
    while changed:
        changed = False
        for v in list(nodes):
            if v in nodes and len(adj[v]) < k:
                nodes.discard(v)
                changed = True
                for u in adj[v]:
                    adj[u].discard(v)
                adj[v] = set()
    return sorted((v, len(adj[v])) for v in nodes)


def hll_hourly_users(sf_dir: str) -> list[tuple[str, int]]:
    """Sequential HLL of distinct user_ids per hour — the independent twin
    of `pipelines.textstats.hourly_approx_uniques` (same md5-64 register
    fold, same str(user_id) value representation, same str(hour) key,
    same exact-integer-grid estimate as the computed DuckDB twin)."""
    import math

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    import pyarrow.compute as _pc

    hours = _pc.floor_temporal(t.column("ts"), unit="hour").to_pylist()
    regs: dict[str, list[int]] = {}
    for h, u in zip(hours, t.column("user_id").to_pylist()):
        r = regs.setdefault(str(h), [0] * HLL_M)
        hv = int.from_bytes(
            hashlib.md5(str(u).encode("utf-8")).digest()[:8], "big"
        )
        idx = hv >> (64 - HLL_P)
        rest = hv & ((1 << (64 - HLL_P)) - 1)
        rank = (64 - HLL_P) - rest.bit_length() + 1
        if rank > r[idx]:
            r[idx] = rank
    out = []
    for h in sorted(regs):
        r = regs[h]
        S = sum(1 << (53 - v) for v in r)
        raw = (
            (0.7213 / (1 + 1.079 / 4096.0)) * 4096 * 4096
            * 9007199254740992.0 / float(S)
        )
        zeros = sum(1 for v in r if v == 0)
        if raw <= 2.5 * 4096 and zeros:
            out.append((h, math.floor(4096.0 * math.log(4096.0 / zeros) + 0.5)))
        else:
            out.append((h, math.floor(raw + 0.5)))
    return out


def extraction_delta_oracle(sf_dir: str) -> tuple[int, int, int]:
    """Sequential twin of `pipelines.extract_stats.extraction_delta`:
    re-extract v1 and the ~2% v2 overlay with the INDEPENDENT per-doc
    oracle extractor and report (n_docs, n_changed, changed-id digest)."""
    from ocr_engine_ray import oracle, synth
    from ocr_engine_ray.pipelines.extract_stats import (
        DELTA_MOD,
        DELTA_RESIDUE,
        _DELTA_NOTE,
    )
    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest
    from ocr_engine_ray import spec

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    n = nc = dg = 0
    for num, text, lang in zip(
        t.column("doc_id").to_pylist(),
        t.column("text").to_pylist(),
        t.column("lang").to_pylist(),
    ):
        doc = synth.derive_doc(num, text, lang)
        n += 1
        if num % DELTA_MOD != DELTA_RESIDUE:
            continue
        e1 = oracle.extract_document(doc)
        doc2 = dict(doc)
        doc2["spans"] = list(doc["spans"]) + [
            {
                "kind": spec.KIND_TEXT,
                "text": _DELTA_NOTE,
                "media_ref": "",
                "offset": 1_000_000_000,
            }
        ]
        e2 = oracle.extract_document(doc2)
        key = lambda e: [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in e["spans"]
        ]
        if key(e1) != key(e2):
            nc += 1
            dg = (dg + row_digest(str(doc["doc_id"]), "changed")) % DIGEST_MOD
    return n, nc, dg


def mmr_select(
    sf_dir: str, *, k: int = 10, num_candidates: int = 64, lam: float = 0.7
) -> list[tuple[int, int]]:
    """Sequential twin of `pipelines.ann.mmr_diverse_topk`: full-corpus
    relevance, top-candidates cut, then a PLAIN-PYTHON greedy (per-pair
    dot products, no vectorized argmax) — independent of the pipeline's
    numpy greedy.  Returns [(rank, vec_id), ...]."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vid = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    mn = m / n[:, None]
    qi = int(np.argmin(vid))
    rel = mn @ mn[qi]
    rel[vid == vid[qi]] = -np.inf
    order = np.lexsort((vid, -rel))[:num_candidates]
    order = order[np.isfinite(rel[order])]
    cvid, crel, cmn = vid[order], rel[order], mn[order]
    selected: list[int] = []
    chosen: list[int] = []
    for _ in range(min(k, len(cvid))):
        best = None
        for i in range(len(cvid)):
            if i in chosen:
                continue
            if not chosen:
                sc = lam * crel[i]
            else:
                sc = lam * crel[i] - (1.0 - lam) * max(
                    float(cmn[i] @ cmn[j]) for j in chosen
                )
            key = (-sc, int(cvid[i]))
            if best is None or key < best[0]:
                best = (key, i)
        chosen.append(best[1])
        selected.append(int(cvid[best[1]]))
    return [(r + 1, v) for r, v in enumerate(selected)]


def lpa_labels(
    sf_dir: str, *, min_support: int = 2, rounds: int = 8
) -> tuple[int, int, int]:
    """Sequential twin of `pipelines.graph.lpa_communities_digest`: plain
    dict/Counter synchronous label propagation, identical fixed-round
    schedule and (count desc, label asc) tie-break.  Returns
    (n_nodes, n_communities, digest)."""
    from collections import Counter, defaultdict

    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order: dict[int, list[int]] = defaultdict(list)
    for ok, pk in zip(
        li.column("l_orderkey").to_pylist(), li.column("l_partkey").to_pylist()
    ):
        by_order[ok].append(pk)
    # support counts LINEITEM row pairs (the twin's self-join), not
    # distinct parts per order — a part listed twice pairs twice
    support: Counter = Counter()
    for parts in by_order.values():
        for i in range(len(parts)):
            for j in range(len(parts)):
                if parts[i] < parts[j]:
                    support[(parts[i], parts[j])] += 1
    adj: dict[int, list[int]] = defaultdict(list)
    for (a, b), n in support.items():
        if n >= min_support:
            adj[a].append(b)
            adj[b].append(a)
    label = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v, nbrs in adj.items():
            c = Counter(label[u] for u in nbrs)
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[v] = best
        label = new
    dg = 0
    for v in label:
        dg = (dg + row_digest(str(v), str(label[v]))) % DIGEST_MOD
    return len(label), len(set(label.values())), dg


def stationary_rows(sf_dir: str) -> tuple[int, int]:
    """Sequential twin of `pipelines.analytics.markov_stationary_digest`:
    plain dict transition counting (per-user (ts, event_id) order) and an
    INDEPENDENT exact solver — the Markov-chain-tree / adjugate route:
    for the integer matrix A = D − N with zero row sums, the left null
    vector is the vector of diagonal cofactors of A, computed as exact
    integer determinants (Bareiss-free naive expansion via Fraction-less
    integer elimination is overkill at K ≤ 10; plain cofactor expansion).
    Returns (n_states, digest) with the engine's fold."""
    from fractions import Fraction

    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    by_user: dict[int, list[tuple]] = {}
    for eid, uid, ts, et in zip(
        ev.column("event_id").to_pylist(),
        ev.column("user_id").to_pylist(),
        ev.column("ts").to_pylist(),
        ev.column("event_type").to_pylist(),
    ):
        if uid is None or ts is None:
            continue
        by_user.setdefault(uid, []).append((ts, eid, et))
    counts: dict[tuple[str, str], int] = {}
    for seq in by_user.values():
        seq.sort(key=lambda t: (t[0], t[1]))
        for a, b in zip(seq, seq[1:]):
            counts[(a[2], b[2])] = counts.get((a[2], b[2]), 0) + 1
    states = sorted({p for p, _ in counts} | {q for _, q in counts})
    k = len(states)
    if k == 0:
        return 0, 0
    idx = {s: i for i, s in enumerate(states)}
    N = [[0] * k for _ in range(k)]
    for (p, q), n in counts.items():
        N[idx[p]][idx[q]] += n
    out = [sum(row) for row in N]
    for i in range(k):
        if out[i] == 0:
            N[i] = [1] * k
            out[i] = k
    A = [
        [(out[i] if i == j else 0) - N[i][j] for j in range(k)]
        for i in range(k)
    ]

    def det(m: list[list[int]]) -> int:
        n = len(m)
        if n == 0:
            return 1
        if n == 1:
            return m[0][0]
        total = 0
        for c in range(n):
            if m[0][c] == 0:
                continue
            minor = [row[:c] + row[c + 1 :] for row in m[1:]]
            total += (-1) ** c * m[0][c] * det(minor)
        return total

    cof = [
        det([[A[r][c] for c in range(k) if c != i] for r in range(k) if r != i])
        for i in range(k)
    ]
    tot = sum(cof)
    if tot == 0:
        pis = [Fraction(1, k)] * k
    else:
        pis = [Fraction(c, tot) for c in cof]
    dg = 0
    for s, o, p in zip(states, out, pis):
        ppm = round(p * 1_000_000)
        dg = (dg + row_digest(str(s), f"{o}\x1f{ppm}")) % DIGEST_MOD
    return k, dg


def hyperball_rows(sf_dir: str, *, min_support: int = 2, rounds: int = 4) -> tuple[int, int]:
    """Sequential twin of `pipelines.graph.hyperball_digest`: plain-dict
    co-purchase adjacency (the lpa_labels support rule), per-node
    HB_M-register sketches under the shared `functions.sketch` spec,
    synchronous max-merge rounds, Σ of per-node rounded-integer
    estimates per round.  Returns (n_rounds, digest)."""
    from collections import Counter, defaultdict

    from ocr_engine_ray.functions.sketch import HB_M, hb_estimate_rows, hb_node_register
    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order: dict[int, list[int]] = defaultdict(list)
    for ok, pk in zip(
        li.column("l_orderkey").to_pylist(), li.column("l_partkey").to_pylist()
    ):
        by_order[ok].append(pk)
    support: Counter = Counter()
    for parts in by_order.values():
        for i in range(len(parts)):
            for j in range(len(parts)):
                if parts[i] < parts[j]:
                    support[(parts[i], parts[j])] += 1
    adj: dict[int, list[int]] = defaultdict(list)
    for (a, b), n in support.items():
        if n >= min_support:
            adj[a].append(b)
            adj[b].append(a)
    nodes = sorted(adj)
    regs = {}
    for v in nodes:
        r = np.zeros(HB_M, dtype=np.uint8)
        idx, rank = hb_node_register(v)
        r[idx] = rank
        regs[v] = r

    def total() -> int:
        if not nodes:
            return 0
        mat = np.stack([regs[v] for v in nodes])
        return int(hb_estimate_rows(mat).sum())

    reach = [(0, total())]
    for t in range(1, rounds + 1):
        new = {}
        for v in nodes:
            r = regs[v].copy()
            for u in adj[v]:
                np.maximum(r, regs[u], out=r)
            new[v] = r
        regs = new
        reach.append((t, total()))
    dg = 0
    for t, rp in reach:
        dg = (dg + row_digest(str(t), str(rp))) % DIGEST_MOD
    return rounds, dg


def compression_hist_rows(sf_dir: str) -> tuple[int, int]:
    """Sequential twin of `textstats.compression_ratio_digest`: plain
    loop + Counter, same level-6 zlib and integer bucket rule.  Returns
    (n_rows, digest)."""
    import zlib
    from collections import Counter

    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    counts: Counter = Counter()
    for s, txt in zip(t.column("source").to_pylist(), t.column("text").to_pylist()):
        if not txt:
            continue
        raw = txt.encode("utf-8")
        pct = len(zlib.compress(raw, 6)) * 100 // len(raw)
        counts[(s, min(pct, 119) // 10)] += 1
    dg = 0
    for (s, b), n in counts.items():
        dg = (dg + row_digest(f"{s}\x1f{b}", str(n))) % DIGEST_MOD
    return len(counts), dg


def holt_rows(sf_dir: str) -> tuple[int, int]:
    """Sequential twin of `rankstats.holt_forecast_digest`: plain-dict
    daily fold (round-half-away cents like DuckDB round), the same
    fixed-point recursion spec with its own rdiv reimplementation.
    Returns (n_h, digest)."""
    import datetime as _dt
    from decimal import ROUND_HALF_UP, Decimal

    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    daily: dict[_dt.date, int] = {}
    for ts, v in zip(ev.column("ts").to_pylist(), ev.column("value").to_pylist()):
        # exact value of the IEEE product v*100.0, ties away — bitwise the
        # engine's pc.round(pc.multiply(arr, 100.0), half_towards_infinity)
        cents = int(Decimal(float(v) * 100.0).quantize(Decimal(1), ROUND_HALF_UP))
        d = ts.date()
        daily[d] = daily.get(d, 0) + cents

    def rdiv(n: int, d: int) -> int:
        q, r = divmod(n, d)
        if 2 * r > d or (2 * r == d and q % 2 == 1):
            q += 1
        return q

    if not daily:
        return 0, 0
    days = sorted(daily)
    span = (days[-1] - days[0]).days
    xs = [daily.get(days[0] + _dt.timedelta(days=i), 0) for i in range(span + 1)]
    S = 1_000_000
    level, trend = xs[0] * S, 0
    for x in xs[1:]:
        nl = rdiv(3 * x * S + 7 * (level + trend), 10)
        trend = rdiv(1 * (nl - level) + 9 * trend, 10)
        level = nl
    dg = 0
    for h in range(1, 8):
        f = rdiv(level + h * trend, S)
        dg = (dg + row_digest(str(h), str(f))) % DIGEST_MOD
    return 7, dg


def kcenter_rows(sf_dir: str, *, k: int = 8) -> tuple[int, int]:
    """Sequential twin of `ann.kcenter_digest`: full-matrix numpy greedy
    k-center on the same 2^20 integer grid, same (dmin desc, id asc)
    tie-break and smallest-id seed.  Returns (n_centers, digest)."""
    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    if not len(ids):
        return 0, 0
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    q = np.round(mat * (1 << 20)).astype(np.int64)
    rows = [(0, int(ids[0]), 0)]
    dmin = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    center = q[0]
    for step in range(1, min(k, len(ids))):
        diff = q - center[None, :]
        d = np.einsum("ij,ij->i", diff, diff)
        np.minimum(dmin, d, out=dmin)
        mx = int(dmin.max())
        nxt_id = int(ids[dmin == mx].min())
        center = q[int(np.searchsorted(ids, nxt_id))]
        rows.append((step, nxt_id, mx))
    dg = 0
    for s, c, r in rows:
        dg = (dg + row_digest(str(s), f"{c}\x1f{r}")) % DIGEST_MOD
    return len(rows), dg


def betweenness_rows(
    sf_dir: str, *, min_support: int = 2, num_pivots: int = 8
) -> tuple[int, int, int]:
    """Sequential twin of `graph.betweenness_digest`: plain dict/list
    Brandes from the same smallest-id pivots, σ as exact Python ints,
    δ on the shared 2^30 grid with the identical per-edge float
    expression.  Returns (n_nodes, n_pivots, digest)."""
    from collections import Counter, defaultdict

    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order: dict[int, list[int]] = defaultdict(list)
    for ok, pk in zip(
        li.column("l_orderkey").to_pylist(), li.column("l_partkey").to_pylist()
    ):
        by_order[ok].append(pk)
    support: Counter = Counter()
    for parts in by_order.values():
        for i in range(len(parts)):
            for j in range(len(parts)):
                if parts[i] < parts[j]:
                    support[(parts[i], parts[j])] += 1
    adj: dict[int, list[int]] = defaultdict(list)
    for (x, y), n in support.items():
        if n >= min_support:
            adj[x].append(y)
            adj[y].append(x)
    nodes = sorted(adj)
    if not nodes:
        return 0, 0, 0
    G = 1 << 30
    total: dict[int, int] = {}
    for s in nodes[:num_pivots]:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        frontier = [s]
        while frontier:
            nxt = set()
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        nxt.add(w)
                    if dist[w] == dist[v] + 1:
                        sigma[w] = sigma.get(w, 0) + sigma[v]
            frontier = sorted(nxt)
            if frontier:
                levels.append(frontier)
        dq: dict[int, int] = {}
        for lvl in reversed(levels[:-1]):
            for v in lvl:
                acc = 0
                for w in adj[v]:
                    if dist.get(w) == dist[v] + 1:
                        t = (
                            (float(sigma[v]) / float(sigma[w]))
                            * (1.0 + float(dq.get(w, 0)) / G)
                            * G
                        )
                        acc += round(t)
                if acc:
                    dq[v] = acc
        for v, q in dq.items():
            if v != s:
                total[v] = total.get(v, 0) + q
    dg = 0
    for v, q in total.items():
        if q:
            dg = (dg + row_digest(str(v), str(q))) % DIGEST_MOD
    return len(nodes), min(num_pivots, len(nodes)), dg


def vocab_sketch_rows(sf_dir: str) -> tuple[int, int]:
    """Sequential twin of `textstats.vocab_sketch_digest`: plain-dict HLL
    registers per source over the ASCII-'\\S+' token stream (md5-64
    hashing + the exact-integer-grid estimate, the computed-DuckDB-twin
    arithmetic), pairwise max-union + inclusion-exclusion.  Returns
    (n_pairs, digest)."""
    import math

    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    regs: dict[str, list[int]] = {}
    tok_re = re.compile(r"[^ \t\n\f\r]+")
    for s, txt in zip(t.column("source").to_pylist(), t.column("text").to_pylist()):
        r = regs.setdefault(s, [0] * HLL_M)
        for tok in set(tok_re.findall(txt or "")):
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
            )
            idx = h >> (64 - HLL_P)
            rest = h & ((1 << (64 - HLL_P)) - 1)
            rank = (64 - HLL_P) - rest.bit_length() + 1
            if rank > r[idx]:
                r[idx] = rank
    def estimate(r: list[int]) -> int:
        S = sum(1 << (53 - v) for v in r)
        raw = (
            (0.7213 / (1 + 1.079 / 4096.0)) * 4096 * 4096
            * 9007199254740992.0 / float(S)
        )
        zeros = sum(1 for v in r if v == 0)
        if raw <= 2.5 * 4096 and zeros:
            return math.floor(4096.0 * math.log(4096.0 / zeros) + 0.5)
        return math.floor(raw + 0.5)

    srcs = sorted(regs)
    est = {s: estimate(regs[s]) for s in srcs}
    dg = 0
    n = 0
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            u = estimate([max(x, y) for x, y in zip(regs[a], regs[b])])
            inter = est[a] + est[b] - u
            j = max(inter, 0) * 1_000_000 // u if u else 0
            pay = "\x1f".join(str(v) for v in (est[a], est[b], u, inter, j))
            dg = (dg + row_digest(f"{a}\x1f{b}", pay)) % DIGEST_MOD
            n += 1
    return n, dg


def ppr_rows(
    sf_dir: str, *, min_support: int = 2, num_seeds: int = 4, iters: int = 30,
    top_k: int = 10,
) -> tuple[int, int]:
    """Sequential twin of `pagerank.ppr_digest`: plain-dict adjacency,
    per-node half-even fixed-point outflow, same restart/iteration spec.
    Returns (n_rows, digest)."""
    from collections import Counter, defaultdict

    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order: dict[int, list[int]] = defaultdict(list)
    for ok, pk in zip(
        li.column("l_orderkey").to_pylist(), li.column("l_partkey").to_pylist()
    ):
        by_order[ok].append(pk)
    support: Counter = Counter()
    for parts in by_order.values():
        for i in range(len(parts)):
            for j in range(len(parts)):
                if parts[i] < parts[j]:
                    support[(parts[i], parts[j])] += 1
    adj: dict[int, list[int]] = defaultdict(list)
    for (x, y), n in support.items():
        if n >= min_support:
            adj[x].append(y)
            adj[y].append(x)
    nodes = sorted(adj)
    if not nodes:
        return 0, 0
    S = 1_000_000_000_000

    def rdiv(n: int, d: int) -> int:
        q, r = divmod(n, d)
        if 2 * r > d or (2 * r == d and q % 2 == 1):
            q += 1
        return q

    dg = 0
    n_rows = 0
    for sd in nodes[:num_seeds]:
        x = {v: 0 for v in nodes}
        x[sd] = S
        for _ in range(iters):
            nx = {v: 0 for v in nodes}
            for u in nodes:
                if x[u] == 0:
                    continue
                t = rdiv(85 * x[u], 100 * len(adj[u]))
                for v in adj[u]:
                    nx[v] += t
            nx[sd] += 15 * S // 100
            x = nx
        ranked = sorted(
            ((v, s) for v, s in x.items() if v != sd and s > 0),
            key=lambda kv: (-kv[1], kv[0]),
        )[:top_k]
        for rank, (v, s) in enumerate(ranked, start=1):
            dg = (dg + row_digest(f"{sd}\x1f{rank}", f"{v}\x1f{s}")) % DIGEST_MOD
            n_rows += 1
    return n_rows, dg


def ann_eval_rows(sf_dir: str, *, num_queries: int = 8, k: int = 5) -> tuple[int, int]:
    """Sequential twin of `ann.ann_eval_digest`: brute-force ground truth
    recomputed with plain per-row float64 math (same normalize + dot and
    (score desc, vec_id asc) tie-break as the pipeline), approximate
    lists from the existing sequential twins, the same eval math.
    Returns (n_rows, digest)."""
    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    qids = ids[:num_queries]
    qmat = mat[:num_queries]
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    sims = (mat / n[:, None]) @ qmat.T
    truth = []
    for qi, q in enumerate(qids.tolist()):
        s = sims[:, qi].copy()
        s[ids == q] = -np.inf
        o = np.lexsort((ids, -s))[:k]
        for r, i in enumerate(o.tolist(), start=1):
            if np.isfinite(s[i]):
                truth.append((q, r, int(ids[i])))
    import math

    lists = {
        "lsh": ann_lsh_topk(sf_dir, num_queries=num_queries, k=k),
        "ivf": ivf_topk(sf_dir, num_queries=num_queries, k=k),
    }
    tsets: dict[int, set[int]] = {}
    for q, _, v in truth:
        tsets.setdefault(int(q), set()).add(int(v))
    dg = 0
    n_rows = 0
    for method in sorted(lists):
        ranked: dict[int, list[tuple[int, int]]] = {}
        for q, r, v in lists[method]:
            ranked.setdefault(int(q), []).append((int(r), int(v)))
        n_q, sum_rec, sum_ndcg = 0, 0, 0
        for q in sorted(tsets):
            tset = tsets[q]
            if not tset:
                continue
            n_q += 1
            lst = sorted(ranked.get(q, []))
            hits = sum(1 for _, v in lst if v in tset)
            sum_rec += hits * 1_000_000 // k
            ideal = min(k, len(tset))
            idcg = sum(1.0 / math.log2(r + 1) for r in range(1, ideal + 1))
            dcg = sum(1.0 / math.log2(r + 1) for r, v in lst if v in tset)
            sum_ndcg += round(dcg / idcg * float(1 << 40))
        pay = f"{n_q}\x1f{sum_rec // n_q if n_q else 0}\x1f{sum_ndcg}"
        dg = (dg + row_digest(method, pay)) % DIGEST_MOD
        n_rows += 1
    return n_rows, dg


def dedup_eval_rows(sf_dir: str, *, threshold: float = 0.8, mod: int = 2) -> tuple[int, int]:
    """Sequential twin of `dedup.dedup_eval_digest`: truth = union-find
    over exact word-trigram Jaccard pairs within the doc_id % mod == 0
    sample (plain set intersections, the `jaccard` spec with the
    wordless-doc {""} convention); predictions from the existing
    minhash/simhash sequential cluster twins restricted to the sample.
    Returns (n_rows, digest)."""
    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = [
        (int(d), txt or "")
        for d, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        )
        if int(d) % mod == 0
    ]

    def trigrams(text: str) -> frozenset:
        words = WORD_RE.findall(text.lower())
        if len(words) < 3:
            return frozenset({" ".join(words)})
        return frozenset(
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        )

    sets = {d: trigrams(txt) for d, txt in docs}
    ids = sorted(sets)
    uf = _UnionFind()
    for i, a in enumerate(ids):
        sa = sets[a]
        for b in ids[i + 1 :]:
            sb = sets[b]
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union and inter / union >= threshold:
                uf.union(a, b)
    tclust: dict[int, list[int]] = {}
    for v in uf.parent:
        tclust.setdefault(uf.find(v), []).append(v)
    true_pairs = {
        (x, y)
        for mem in tclust.values()
        for i, x in enumerate(sorted(mem))
        for y in sorted(mem)[i + 1 :]
    }

    def pairs_from(rows) -> set:
        clust: dict[int, list[int]] = {}
        for d, c in rows:
            if d % mod == 0:
                clust.setdefault(c, []).append(d)
        return {
            (x, y)
            for mem in clust.values()
            for i, x in enumerate(sorted(mem))
            for y in sorted(mem)[i + 1 :]
        }

    methods = {
        "minhash_lsh": pairs_from(minhash_clusters(sf_dir, threshold=threshold)),
        "simhash": pairs_from(simhash_clusters(sf_dir)),
    }
    dg = 0
    n_rows = 0
    for m in sorted(methods):
        pred = methods[m]
        inter = len(pred & true_pairs)
        p = inter * 1_000_000 // len(pred) if pred else 0
        r = inter * 1_000_000 // len(true_pairs) if true_pairs else 0
        pay = f"{len(true_pairs)}\x1f{len(pred)}\x1f{p}\x1f{r}"
        dg = (dg + row_digest(m, pay)) % DIGEST_MOD
        n_rows += 1
    return n_rows, dg


def rake_rows(sf_dir: str, *, top_k: int = 20, max_phrase: int = 3) -> tuple[int, int]:
    """Sequential twin of `textstats.rake_rows` gate: plain-Counter RAKE
    with the same stopword set, run-chunking rule, q20 word-score grid
    and (score desc, n desc, phrase asc) ranking.  Returns
    (n_rows, digest)."""
    from collections import Counter

    from ocr_engine_ray.functions.textstats import STOPWORDS
    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    stop = STOPWORDS["en"]
    tok_re = re.compile(r"[^ \t\n\f\r]+")
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    phrases: Counter = Counter()
    freq: Counter = Counter()
    deg: Counter = Counter()
    for txt in t.column("text").to_pylist():
        toks = [w.lower() for w in tok_re.findall(txt or "")]
        run: list[str] = []
        runs = []
        for w in toks:
            if w in stop:
                if run:
                    runs.append(run)
                    run = []
            else:
                run.append(w)
        if run:
            runs.append(run)
        for r in runs:
            for i in range(0, len(r), max_phrase):
                ph = tuple(r[i : i + max_phrase])
                phrases[ph] += 1
                for w in ph:
                    freq[w] += 1
                    deg[w] += len(ph)
    wscore = {
        w: round(deg[w] / freq[w] * (1 << 20)) for w in freq
    }
    rows = []
    for ph, n in phrases.items():
        rows.append((" ".join(ph), n, sum(wscore[w] for w in ph)))
    rows.sort(key=lambda r: (-r[2], -r[1], r[0]))
    rows = rows[:top_k]
    dg = 0
    for rank, (ph, n, sq) in enumerate(rows, start=1):
        dg = (dg + row_digest(str(rank), f"{ph}\x1f{n}\x1f{sq}")) % DIGEST_MOD
    return len(rows), dg


def field_provenance_rows(sf_dir: str) -> tuple[int, int]:
    """Sequential twin of `interpret.field_provenance_digest`: per-doc
    `oracle.rich_fields_document` (the independent app.py transcription)
    parsed back, plain-Counter (label, page) histogram.  Returns
    (n_rows, digest)."""
    import json as _json
    from collections import Counter

    from ocr_engine_ray import oracle, synth
    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    counts: Counter = Counter()
    for d, txt, lang in zip(
        t.column("doc_id").to_pylist(),
        t.column("text").to_pylist(),
        t.column("lang").to_pylist(),
    ):
        doc = synth.derive_doc(int(d), txt or "", lang or "")
        js = oracle.rich_fields_document(doc)
        for label, rec in _json.loads(js).items():
            src = rec.get("source") or ""
            page = int(src.rsplit("#page ", 1)[1]) if "#page " in src else 0
            counts[(label, page)] += 1
    dg = 0
    for (label, page), n in counts.items():
        dg = (dg + row_digest(f"{label}\x1f{page}", str(n))) % DIGEST_MOD
    return len(counts), dg


# --- HITS hubs & authorities ------------------------------------------------


def hits_rows(sf_dir: str, *, iters: int = 4) -> tuple[int, int]:
    """Sequential twin of `pagerank.hits_digest`: dict adjacency over the
    distinct customer→supplier trading pairs, Python-int HITS rounds with
    half-even renormalization to total mass 10^12 per side.  Returns
    (n_nodes, digest)."""
    from collections import defaultdict

    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust_of = dict(
        zip(
            orders.column("o_orderkey").to_pylist(),
            orders.column("o_custkey").to_pylist(),
        )
    )
    pairs = set()
    for ok, sk in zip(
        li.column("l_orderkey").to_pylist(), li.column("l_suppkey").to_pylist()
    ):
        pairs.add((cust_of[ok], sk))
    if not pairs:
        return 0, 0
    out_of: dict[int, list[int]] = defaultdict(list)
    in_of: dict[int, list[int]] = defaultdict(list)
    for c, s in pairs:
        out_of[c].append(s)
        in_of[s].append(c)
    SCALE = 1_000_000_000_000

    def rdiv(n: int, d: int) -> int:
        q, r = divmod(n, d)
        if 2 * r > d or (2 * r == d and q % 2 == 1):
            q += 1
        return q

    def renorm(x: dict[int, int]) -> dict[int, int]:
        tot = sum(x.values())
        return {k: rdiv(v * SCALE, tot) for k, v in x.items()}

    h = {c: 1_000_000 for c in out_of}
    a: dict[int, int] = {}
    for _ in range(iters):
        a = renorm({s: sum(h[c] for c in cs) for s, cs in in_of.items()})
        h = renorm({c: sum(a[s] for s in ss) for c, ss in out_of.items()})
    dg = 0
    n_rows = 0
    for c, v in h.items():
        dg = (dg + row_digest(f"customer\x1f{c}", str(v))) % DIGEST_MOD
        n_rows += 1
    for s, v in a.items():
        dg = (dg + row_digest(f"supplier\x1f{s}", str(v))) % DIGEST_MOD
        n_rows += 1
    return n_rows, dg


# --- binary-quantization search --------------------------------------------


def bq_rows(
    sf_dir: str, *, num_queries: int = 8, k: int = 5, n_candidates: int = 256
) -> tuple[int, int]:
    """Sequential twin of `ann.bq_digest`: full-corpus numpy, same exact
    integer mean-threshold bits, Hamming candidate cut and q20 rerank.
    Returns (n_rows, digest)."""
    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    xq = np.round(m * (1 << 20)).astype(np.int64)
    thr = xq.sum(axis=0)
    n = len(vid)
    bits = (xq * n) > thr[None, :]
    order = np.argsort(vid)
    qsel = order[:num_queries]
    dg = 0
    n_rows = 0
    for qrow in qsel:
        qid = int(vid[qrow])
        ham = (bits ^ bits[qrow][None, :]).sum(axis=1).astype(np.int64)
        ham[vid == qid] = np.iinfo(np.int64).max
        cand = np.lexsort((vid, ham))[:n_candidates]
        cand = cand[ham[cand] != np.iinfo(np.int64).max]
        score = xq[cand] @ xq[qrow]
        top = np.lexsort((vid[cand], -score))[: min(k, len(cand))]
        for rank, ix in enumerate(top, start=1):
            key = f"{qid}\x1f{rank}"
            pay = f"{int(vid[cand][ix])}\x1f{int(score[ix])}"
            dg = (dg + row_digest(key, pay)) % DIGEST_MOD
            n_rows += 1
    return n_rows, dg


def cluster_outlier_rows(
    sf_dir: str, *, k: int = 8, iters: int = 5, factor: int = 4
) -> tuple[int, int]:
    """Sequential twin of `ann.cluster_outlier_digest`: full-corpus numpy,
    same float assignment, exact q20 integer distances, lower median.
    Returns (n_rows, digest)."""
    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    vid, m = _load_vecs(sf_dir)
    c = kmeans_centroids(sf_dir, k=k, iters=iters)
    a = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    xq = np.round(m * (1 << 20)).astype(np.int64)
    cq = np.round(c * (1 << 20)).astype(np.int64)
    diff = xq - cq[a]
    dq = (diff * diff).sum(axis=1)
    dg = 0
    n_rows = 0
    for ci in sorted(set(a.tolist())):
        d = np.sort(dq[a == ci])
        n = len(d)
        med = int(d[(n - 1) // 2])
        nout = int((d > factor * med).sum())
        pay = f"{n}\x1f{med}\x1f{nout}\x1f{nout * 1_000_000 // n}"
        dg = (dg + row_digest(str(ci), pay)) % DIGEST_MOD
        n_rows += 1
    return n_rows, dg


def ktruss_rows(
    sf_dir: str, *, k: int = 3, min_support: int = 2
) -> tuple[int, int]:
    """Sequential twin of `graph.ktruss_digest`: dict adjacency over the
    co-purchase graph, naive per-round common-neighbor supports, peel
    until fixed point.  Returns (n_edges, digest)."""
    from collections import Counter, defaultdict

    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order: dict[int, list[int]] = defaultdict(list)
    for ok, pk in zip(
        li.column("l_orderkey").to_pylist(), li.column("l_partkey").to_pylist()
    ):
        by_order[ok].append(pk)
    support: Counter = Counter()
    for parts in by_order.values():
        for i in range(len(parts)):
            for j in range(len(parts)):
                if parts[i] < parts[j]:
                    support[(parts[i], parts[j])] += 1
    edges = {e for e, n in support.items() if n >= min_support}
    need = k - 2
    while True:
        nbrs: dict[int, set[int]] = defaultdict(set)
        for a, b in edges:
            nbrs[a].add(b)
            nbrs[b].add(a)
        keep = {
            (a, b) for a, b in edges if len(nbrs[a] & nbrs[b]) >= need
        }
        if keep == edges:
            break
        edges = keep
    dg = 0
    for a, b in sorted(edges):
        dg = (dg + row_digest(str(a), str(b))) % DIGEST_MOD
    return len(edges), dg


def cdc_rows(sf_dir: str, *, mask_bits: int = 6) -> tuple[int, int]:
    """Sequential twin of `dedup.cdc_digest`: per-doc gear-hash cut points
    (pure-Python rolling hash — independent of the vectorized engine
    kernel), per-source chunk multisets, same ratio arithmetic.
    Returns (n_rows, digest)."""
    import hashlib
    from collections import defaultdict

    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    gear = [
        int.from_bytes(hashlib.md5(bytes([b])).digest()[:8], "big")
        for b in range(256)
    ]
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    occ: dict[str, list] = defaultdict(list)
    for sc, txt in zip(t.column("source").to_pylist(), t.column("text").to_pylist()):
        data = (txt or "").encode("utf-8")
        h = 0
        prev = 0
        mask = (1 << mask_bits) - 1
        window_mask = (1 << 64) - 1
        for i, byte in enumerate(data):
            h = ((h << 1) + gear[byte]) & window_mask
            if (h & mask) == 0:
                occ[sc].append(data[prev : i + 1])
                prev = i + 1
        if prev != len(data) or not data:
            if data:
                occ[sc].append(data[prev:])
    dg = 0
    n_rows = 0
    for sc in sorted(occ):
        chunks = occ[sc]
        hashes = [hashlib.md5(c).hexdigest() for c in chunks]
        seen: dict[str, int] = {}
        for hx, c in zip(hashes, chunks):
            seen.setdefault(hx, len(c))
        total = sum(len(c) for c in chunks)
        uniq = sum(seen.values())
        ratio = (total - uniq) * 1_000_000 // total if total else 0
        pay = f"{len(chunks)}\x1f{len(seen)}\x1f{total}\x1f{uniq}\x1f{ratio}"
        dg = (dg + row_digest(sc, pay)) % DIGEST_MOD
        n_rows += 1
    return n_rows, dg


def holt_backtest_rows(sf_dir: str, *, k: int = 28) -> tuple[int, int, int, int, int]:
    """Sequential twin of `rankstats.holt_backtest`: Counter-built daily
    series, the same exact-integer prefix recursions.  Returns
    (k_days, mae_holt, mae_naive, holt_wins, improvement_ppm)."""
    from collections import Counter

    from ocr_engine_ray.pipelines.rankstats import (
        HOLT_ALPHA_NUM,
        HOLT_BETA_NUM,
        HOLT_DEN,
        HOLT_SCALE,
        _rdiv_even,
    )

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    per: Counter = Counter()
    for ts, v in zip(t.column("ts").to_pylist(), t.column("value").to_pylist()):
        per[ts.date()] += int(round(v * 100))
    if not per:
        return 0, 0, 0, 0, 0
    days = sorted(per)
    d0, dT = days[0], days[-1]
    T = (dT - d0).days + 1
    xs = [per.get(d0 + __import__("datetime").timedelta(days=i), 0) for i in range(T)]
    k = min(k, T - 2)
    if k <= 0:
        return 0, 0, 0, 0, 0

    def one_ahead(prefix):
        level = prefix[0] * HOLT_SCALE
        trend = 0
        for x in prefix[1:]:
            nl = _rdiv_even(
                HOLT_ALPHA_NUM * x * HOLT_SCALE
                + (HOLT_DEN - HOLT_ALPHA_NUM) * (level + trend),
                HOLT_DEN,
            )
            trend = _rdiv_even(
                HOLT_BETA_NUM * (nl - level) + (HOLT_DEN - HOLT_BETA_NUM) * trend,
                HOLT_DEN,
            )
            level = nl
        return _rdiv_even(level + trend, HOLT_SCALE)

    eh = en = wins = 0
    for t_ix in range(T - k, T):
        a = xs[t_ix]
        fh = one_ahead(xs[:t_ix])
        fn = xs[t_ix - 1]
        deh, den_ = abs(fh - a), abs(fn - a)
        eh += deh
        en += den_
        if deh < den_:
            wins += 1
    mae_h, mae_n = eh // k, en // k
    return k, mae_h, mae_n, wins, (mae_n - mae_h) * 1_000_000 // max(mae_n, 1)


def multiprobe_rows(
    sf_dir: str,
    *,
    num_queries: int = 8,
    k: int = 5,
    num_planes: int = 10,
    num_probes: int = 32,
) -> tuple[int, int]:
    """Sequential twin of `ann.ann_mp_digest`: full-corpus numpy, same
    seeded hyperplanes, the same shift/expand perturbation heap, plain
    per-query candidate scan.  Returns (n_rows, digest)."""
    import heapq

    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    mn = m / n[:, None]
    rng = np.random.default_rng(1234)
    planes = rng.standard_normal((num_planes, m.shape[1]))
    signs = (mn @ planes.T) > 0
    buckets = (
        signs.astype(np.uint32) << np.arange(num_planes, dtype=np.uint32)
    ).sum(axis=1)
    order_q = np.argsort(vid)[:num_queries]
    dg = 0
    n_rows = 0
    for qrow in order_q:
        qid = int(vid[qrow])
        proj = mn[qrow] @ planes.T
        base = int(
            ((proj > 0).astype(np.uint32) << np.arange(num_planes, dtype=np.uint32)).sum()
        )
        margins = np.abs(proj)
        s_order = np.argsort(margins, kind="stable")
        sm = margins[s_order]
        sets: list[tuple[int, ...]] = [()]
        heap = [(float(sm[0] * sm[0]), (0,))]
        seen: set[tuple[int, ...]] = set()
        while heap and len(sets) < num_probes:
            cost, s = heapq.heappop(heap)
            if s in seen:
                continue
            seen.add(s)
            sets.append(tuple(int(s_order[p]) for p in s))
            last = s[-1]
            if last + 1 < len(sm):
                heapq.heappush(
                    heap,
                    (cost - float(sm[last] * sm[last]) + float(sm[last + 1] * sm[last + 1]),
                     s[:-1] + (last + 1,)),
                )
                heapq.heappush(
                    heap, (cost + float(sm[last + 1] * sm[last + 1]), s + (last + 1,))
                )
        probed = set()
        for flips in sets:
            b = base
            for p in flips:
                b ^= 1 << p
            probed.add(b)
        cand = np.nonzero(np.isin(buckets, list(probed)) & (vid != qid))[0]
        sims = mn[cand] @ mn[qrow]
        top = np.lexsort((vid[cand], -sims))[: min(k, len(cand))]
        for rank, ix in enumerate(top, start=1):
            dg = (
                dg + row_digest(f"{qid}\x1f{rank}", str(int(vid[cand][ix])))
            ) % DIGEST_MOD
            n_rows += 1
    return n_rows, dg


def _bq_topk_rows(
    sf_dir: str, *, num_queries: int = 8, k: int = 5, n_candidates: int = 256
) -> list[tuple[int, int, int]]:
    """(query_id, rank, vec_id) rows of the sequential BQ search — the
    list-returning core `bq_rows` digests."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    xq = np.round(m * (1 << 20)).astype(np.int64)
    thr = xq.sum(axis=0)
    n = len(vid)
    bits = (xq * n) > thr[None, :]
    out = []
    for qrow in np.argsort(vid)[:num_queries]:
        qid = int(vid[qrow])
        ham = (bits ^ bits[qrow][None, :]).sum(axis=1).astype(np.int64)
        ham[vid == qid] = np.iinfo(np.int64).max
        cand = np.lexsort((vid, ham))[:n_candidates]
        cand = cand[ham[cand] != np.iinfo(np.int64).max]
        score = xq[cand] @ xq[qrow]
        top = np.lexsort((vid[cand], -score))[: min(k, len(cand))]
        for rank, ix in enumerate(top, start=1):
            out.append((qid, rank, int(vid[cand][ix])))
    return out


def _multiprobe_topk_rows(
    sf_dir: str,
    *,
    num_queries: int = 8,
    k: int = 5,
    num_planes: int = 10,
    num_probes: int = 32,
) -> list[tuple[int, int, int]]:
    """(query_id, rank, vec_id) rows of the sequential multi-probe search."""
    import heapq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    mn = m / n[:, None]
    rng = np.random.default_rng(1234)
    planes = rng.standard_normal((num_planes, m.shape[1]))
    buckets = (
        ((mn @ planes.T) > 0).astype(np.uint32)
        << np.arange(num_planes, dtype=np.uint32)
    ).sum(axis=1)
    out = []
    for qrow in np.argsort(vid)[:num_queries]:
        qid = int(vid[qrow])
        proj = mn[qrow] @ planes.T
        base = int(
            ((proj > 0).astype(np.uint32) << np.arange(num_planes, dtype=np.uint32)).sum()
        )
        margins = np.abs(proj)
        s_order = np.argsort(margins, kind="stable")
        sm = margins[s_order]
        sets: list[tuple[int, ...]] = [()]
        heap = [(float(sm[0] * sm[0]), (0,))]
        seen: set[tuple[int, ...]] = set()
        while heap and len(sets) < num_probes:
            cost, s = heapq.heappop(heap)
            if s in seen:
                continue
            seen.add(s)
            sets.append(tuple(int(s_order[p]) for p in s))
            last = s[-1]
            if last + 1 < len(sm):
                heapq.heappush(
                    heap,
                    (cost - float(sm[last] * sm[last])
                     + float(sm[last + 1] * sm[last + 1]),
                     s[:-1] + (last + 1,)),
                )
                heapq.heappush(
                    heap, (cost + float(sm[last + 1] * sm[last + 1]), s + (last + 1,))
                )
        probed = set()
        for flips in sets:
            b = base
            for p in flips:
                b ^= 1 << p
            probed.add(b)
        cand = np.nonzero(np.isin(buckets, list(probed)) & (vid != qid))[0]
        sims = mn[cand] @ mn[qrow]
        top = np.lexsort((vid[cand], -sims))[: min(k, len(cand))]
        for rank, ix in enumerate(top, start=1):
            out.append((qid, rank, int(vid[cand][ix])))
    return out


def ann_eval2_rows(sf_dir: str, *, num_queries: int = 8, k: int = 5) -> tuple[int, int]:
    """Sequential twin of `ann.ann_eval2_digest`: brute-force truth plus
    the sequential bq / multi-probe lists, the same eval math.
    Returns (n_rows, digest)."""
    import math

    from ocr_engine_ray.pipelines.interpret import DIGEST_MOD, row_digest

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    qids = ids[:num_queries]
    qmat = mat[:num_queries]
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    sims = (mat / n[:, None]) @ qmat.T
    tsets: dict[int, set[int]] = {}
    for qi, q in enumerate(qids.tolist()):
        s = sims[:, qi].copy()
        s[ids == q] = -np.inf
        o = np.lexsort((ids, -s))[:k]
        tsets[int(q)] = {int(ids[i]) for i in o if np.isfinite(s[i])}
    lists = {
        "bq": _bq_topk_rows(sf_dir, num_queries=num_queries, k=k),
        "multiprobe": _multiprobe_topk_rows(sf_dir, num_queries=num_queries, k=k),
    }
    dg = 0
    n_rows = 0
    for method in sorted(lists):
        ranked: dict[int, list[tuple[int, int]]] = {}
        for q, r, v in lists[method]:
            ranked.setdefault(int(q), []).append((int(r), int(v)))
        n_q, sum_rec, sum_ndcg = 0, 0, 0
        for q in sorted(tsets):
            tset = tsets[q]
            if not tset:
                continue
            n_q += 1
            lst = sorted(ranked.get(q, []))
            hits = sum(1 for _, v in lst if v in tset)
            sum_rec += hits * 1_000_000 // k
            ideal = min(k, len(tset))
            idcg = sum(1.0 / math.log2(r + 1) for r in range(1, ideal + 1))
            dcg = sum(
                1.0 / math.log2(r + 1) for r, v in lst if v in tset
            )
            sum_ndcg += int(np.round(dcg / idcg * (1 << 40)))
        mean_rec = sum_rec // max(n_q, 1)
        pay = f"{n_q}\x1f{mean_rec}\x1f{sum_ndcg}"
        dg = (dg + row_digest(method, pay)) % DIGEST_MOD
        n_rows += 1
    return n_rows, dg
