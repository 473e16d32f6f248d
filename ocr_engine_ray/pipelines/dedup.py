"""Deduplication pipelines — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — over a text corpus (the driver's ``documents`` table).

Scale notes (these run over 10^12-row tables in the target deployment):

- Hashing/sketching is per-batch vectorized work inside ``map_batches``.
- The only shuffles are groupbys on *hash keys* (content hash, LSH band
  bucket) whose cardinality ≈ corpus size but whose groups are tiny; skewed
  buckets (a viral boilerplate string) are capped with ``MAX_BUCKET`` and
  every truncation is logged (bucket key + dropped size) by the worker.
- Candidate pairs stay a ``Dataset`` end-to-end: verification is an
  on-cluster union+groupby attach of shingle sets, and clustering is
  distributed per-bucket contraction (`graph.connected_components`) — no
  driver ``take_all`` / union-find anywhere in the path.
- ``embedding_near_dup`` is *exact* all-pairs cosine, distributed as a
  block-pair cartesian: each vector is replicated to its B block-pairs and a
  groupby computes one ``block × block`` matmul per group, so no full-table
  broadcast and no O(N²) single task; shuffle volume is B × corpus.
"""

from __future__ import annotations

import hashlib
import logging
import math
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..sources.tables import sf_table
from .graph import connected_components

logger = logging.getLogger(__name__)

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
MAX_BUCKET = 64  # cap docs considered per LSH bucket (skew guard; logged)
_MERSENNE = (1 << 61) - 1
# ASCII word class, matching RE2's `\w` as DuckDB evaluates it — keeps
# every regexp_extract_all-based SQL twin byte-identical on non-ASCII
# text too (Python `\w` is Unicode-wide; RE2's is [0-9A-Za-z_]).
_WORD_RE = re.compile(r"[0-9A-Za-z_]+")


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


NUM_COARSE_BUCKETS = 256


def minhash_signature_batch(texts: list[str | None]) -> np.ndarray:
    """Batch MinHash, byte-identical to per-doc ``minhash_signature``
    (equality property-tested): all shingle values of the batch are
    concatenated once, then each of the NUM_HASHES permutations runs ONE
    vectorized ``(a*x + b) % p`` + segmented ``np.minimum.reduceat`` over
    the whole batch — no per-doc ``np.outer`` dispatch.  Min is
    order-independent, so the result is exactly
    ``np.stack([minhash_signature(t) for t in texts])``.

    Returns an ``(len(texts), NUM_HASHES)`` uint64 matrix."""
    umax = np.iinfo(np.uint64).max
    sigs = np.full((len(texts), NUM_HASHES), umax, dtype=np.uint64)
    parts: list[np.ndarray] = []
    counts: list[int] = []
    rows: list[int] = []
    for i, t in enumerate(texts):
        sh = _shingles(t)
        if not sh:
            continue
        parts.append(np.fromiter(sh, dtype=np.uint64, count=len(sh)))
        counts.append(len(sh))
        rows.append(i)
    if not parts:
        return sigs
    x = np.concatenate(parts)
    starts = np.concatenate([[0], np.cumsum(counts[:-1])]).astype(np.int64)
    out = np.empty((NUM_HASHES, len(rows)), dtype=np.uint64)
    for h in range(NUM_HASHES):
        # same uint64 wraparound arithmetic as minhash_signature's np.outer
        out[h] = np.minimum.reduceat((_A[h] * x + _B_[h]) % _MERSENNE, starts)
    sigs[np.array(rows, dtype=np.int64)] = out.T
    return sigs


def _band_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → NUM_BANDS rows per doc: (cb, band, bhash, doc_id).

    ``cb`` is a COARSE shuffle key over (band, bhash): grouping directly by
    (band, bhash) is the tiny-groups trap — one Python ``map_groups`` call
    per ~20-doc bucket costs more than the pairing itself at dup-heavy
    corpora (measured 92 s → 8 s at 100k docs / 20x duplication).  The
    coarse groupby processes all of a coarse bucket's runs in one
    vectorized call (`_coarse_bucket_pairs`).

    Signatures come from the batch-vectorized ``minhash_signature_batch``;
    only the NUM_BANDS blake2b bucket keys per doc remain per-row work
    (they define bucket identity and the pinned digest depends on them).
    Row order (doc-major, band-minor) matches the historical per-doc loop."""
    doc_ids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
    sigs = minhash_signature_batch(batch.column("text").to_pylist())
    n = len(doc_ids)
    sb = sigs.tobytes()  # C-contiguous (n, NUM_HASHES) uint64 → 8B/value
    chunk_bytes = ROWS_PER_BAND * 8
    bhashes = [
        hashlib.blake2b(sb[off : off + chunk_bytes], digest_size=8).hexdigest()
        for off in range(0, n * NUM_HASHES * 8, chunk_bytes)
    ]
    bands = np.tile(np.arange(NUM_BANDS, dtype=np.int32), n)
    cb = (
        bands + np.array([int(bh[:8], 16) for bh in bhashes], dtype=np.int64)
    ) % NUM_COARSE_BUCKETS
    return pa.table(
        {
            "cb": pa.array(cb.astype(np.int32)),
            "band": pa.array(bands),
            "bhash": pa.array(bhashes, pa.string()),
            "doc_id": pa.array(np.repeat(doc_ids, NUM_BANDS), pa.int64()),
        }
    )


def _coarse_bucket_pairs(group: pa.Table) -> pa.Table:
    """All (band, bhash) runs of one coarse bucket in a single call: one
    lexsort finds the runs, each qualifying run emits its (capped) pair
    block via triu_indices — no per-bucket Python call, no per-pair append
    loop.  Caps and ordering are byte-identical to the old per-bucket path
    (first MAX_BUCKET doc_ids ascending per (band, bhash))."""
    band = group.column("band").combine_chunks().to_numpy(zero_copy_only=False)
    doc = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
    bh = np.asarray(group.column("bhash").to_pylist(), dtype=object)
    order = np.lexsort((doc, bh, band))
    band, doc, bh = band[order], doc[order], bh[order]
    if len(doc) == 0:
        return _EMPTY_PAIRS
    new = np.concatenate([[True], (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])])
    starts = np.nonzero(new)[0]
    ends = np.concatenate([starts[1:], [len(doc)]])
    a_parts, b_parts = [], []
    for s0, e0 in zip(starts, ends):
        m = e0 - s0
        if m < 2:
            continue
        if m > MAX_BUCKET:
            logger.warning(
                "LSH bucket (band=%s, key=%s) has %d docs; keeping first %d, dropping %d",
                band[s0],
                bh[s0],
                m,
                MAX_BUCKET,
                m - MAX_BUCKET,
            )
            e0 = s0 + MAX_BUCKET
            m = MAX_BUCKET
        ii, jj = np.triu_indices(m, k=1)
        a_parts.append(doc[s0 + ii])
        b_parts.append(doc[s0 + jj])
    if not a_parts:
        return _EMPTY_PAIRS
    return pa.table(
        {
            "a": pa.array(np.concatenate(a_parts)),
            "b": pa.array(np.concatenate(b_parts)),
        }
    )


_EMPTY_PAIRS = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})


def _dedupe_pair_group(group: pa.Table) -> pa.Table:
    """Collapse duplicate (a, b) rows within one endpoint-`a` group.  The
    banding stage emits the same pair once per matching band (up to
    NUM_BANDS copies, possibly in different coarse buckets); grouping on
    `a` co-locates all copies, so a per-group np.unique is a global exact
    dedupe."""
    a = group["a"].combine_chunks().to_numpy(zero_copy_only=False)
    b = group["b"].combine_chunks().to_numpy(zero_copy_only=False)
    if len(a) == 0:
        return _EMPTY_PAIRS
    uniq = np.unique(np.stack([a, b], axis=1), axis=0)
    return pa.table(
        {"a": pa.array(uniq[:, 0], pa.int64()), "b": pa.array(uniq[:, 1], pa.int64())}
    )


def jaccard(s1: set[int], s2: set[int]) -> float:
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    inter = len(s1 & s2)
    return inter / (len(s1) + len(s2) - inter)


def _request_rows(batch: pa.Table, *, num_buckets: int) -> pa.Table:
    """Pair rows → two shingle-request rows, keyed by each endpoint.  Shares
    the (key, a, b, side, text) schema with the doc rows so the two streams
    union into one shuffle."""
    a = batch["a"].combine_chunks() if isinstance(batch["a"], pa.ChunkedArray) else batch["a"]
    b = batch["b"].combine_chunks() if isinstance(batch["b"], pa.ChunkedArray) else batch["b"]
    n = batch.num_rows

    def side(key_col, s):
        kv = np.asarray(key_col.to_pylist(), dtype=np.int64)
        return pa.table(
            {
                "key": key_col,
                "a": a,
                "b": b,
                "side": pa.array(np.full(n, s, dtype=np.int8)),
                "text": pa.nulls(n, pa.string()),
                "_bkt": pa.array(kv % num_buckets, pa.int64()),
            }
        )

    return pa.concat_tables([side(a, 0), side(b, 1)]).combine_chunks()


def _doc_rows(batch: pa.Table, *, num_buckets: int, cand_ref=None) -> pa.Table:
    """Corpus → shingle-source rows.  When ``cand_ref`` is given (a broadcast
    sorted int64 array, or an ``IntBloom`` when the candidate set is too big
    to ship exactly), the batch is filtered to candidates FIRST, so the
    verify shuffle carries O(candidates) text instead of a second all-to-all
    of the whole corpus.  Bloom false positives only admit rows that no
    request will ever match in ``_attach_shingles`` — wasted shingling,
    never a correctness change."""
    if cand_ref is not None:
        from ..functions.sketch import IntBloom

        cand = ray.get(cand_ref)
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        mask = cand.contains(ids) if isinstance(cand, IntBloom) else np.isin(ids, cand)
        batch = batch.filter(pa.array(mask))
    kv = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
    n = batch.num_rows
    return pa.table(
        {
            "key": batch["doc_id"],
            "a": pa.nulls(n, pa.int64()),
            "b": pa.nulls(n, pa.int64()),
            "side": pa.array(np.full(n, -1, dtype=np.int8)),
            "text": batch["text"],
            "_bkt": pa.array(kv % num_buckets, pa.int64()),
        }
    )


def _attach_shingles(group: pa.Table, *, num_buckets: int) -> pa.Table:
    """One verify bucket: shingle each *requested* doc once, emit one
    (a, b, side, sh) row per distinct request, bucketed by pair hash."""
    side = np.asarray(group["side"].to_pylist(), dtype=np.int8)
    keys = group["key"].to_pylist()
    req_idx = np.nonzero(side >= 0)[0]
    if len(req_idx) == 0:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "side": pa.array([], pa.int8()),
                "sh": pa.array([], pa.binary()),
                "_bkt": pa.array([], pa.int64()),
            }
        )
    texts = group["text"].to_pylist()
    keys_np = np.asarray(keys, dtype=np.int64)
    av = np.asarray(group["a"].to_pylist(), dtype=object)
    bv = np.asarray(group["b"].to_pylist(), dtype=object)
    # Vectorized dedup of duplicate requests (a pair reaches this bucket
    # once per band that matched it): lexsort (a, b, side) and keep run
    # starts — no per-row Python set membership (measured hot at dup-heavy
    # corpora: millions of request rows per bucket).
    ra = av[req_idx].astype(np.int64)
    rb = bv[req_idx].astype(np.int64)
    rs = side[req_idx].astype(np.int64)
    order = np.lexsort((rs, rb, ra))
    ra, rb, rs = ra[order], rb[order], rs[order]
    rk = keys_np[req_idx][order]
    first = np.concatenate(
        [[True], (ra[1:] != ra[:-1]) | (rb[1:] != rb[:-1]) | (rs[1:] != rs[:-1])]
    )
    ra, rb, rs, rk = ra[first], rb[first], rs[first], rk[first]
    # shingle each REQUESTED source doc once; lookup via sorted-key binary
    # search instead of a dict of every source row
    src_idx = np.nonzero(side == -1)[0]
    src_keys = keys_np[src_idx]
    sorder = np.argsort(src_keys)
    src_keys = src_keys[sorder]
    src_rows = src_idx[sorder]
    needed_mask = np.isin(src_keys, rk)
    sh_cache: dict[int, bytes] = {
        int(src_keys[i]): np.array(
            sorted(_shingles(texts[src_rows[i]])), dtype="<u4"
        ).tobytes()
        for i in np.nonzero(needed_mask)[0]
    }
    osh = [sh_cache[int(k)] for k in rk]
    obk = (ra * 1_000_003 + rb) % num_buckets
    return pa.table(
        {
            "a": pa.array(ra, pa.int64()),
            "b": pa.array(rb, pa.int64()),
            "side": pa.array(rs.astype(np.int8)),
            "sh": pa.array(osh, pa.binary()),
            "_bkt": pa.array(obk, pa.int64()),
        }
    )


def _verify_pairs(group: pa.Table, *, threshold: float) -> pa.Table:
    """One pair bucket: pivot the two sides of each (a, b) back together and
    keep pairs with exact shingle Jaccard ≥ threshold."""
    av = group["a"].to_pylist()
    bv = group["b"].to_pylist()
    sides = group["side"].to_pylist()
    shs = group["sh"].to_pylist()
    by_pair: dict[tuple[int, int], list[bytes | None]] = {}
    for x, y, s, sh in zip(av, bv, sides, shs):
        slot = by_pair.setdefault((x, y), [None, None])
        slot[s] = sh
    oa, ob = [], []
    for (x, y), (s0, s1) in sorted(by_pair.items()):
        if s0 is None or s1 is None:
            continue
        u1 = np.frombuffer(s0, dtype="<u4")
        u2 = np.frombuffer(s1, dtype="<u4")
        if len(u1) == 0 and len(u2) == 0:
            j = 1.0
        elif len(u1) == 0 or len(u2) == 0:
            j = 0.0
        else:
            inter = len(np.intersect1d(u1, u2, assume_unique=True))
            j = inter / (len(u1) + len(u2) - inter)
        if j >= threshold:
            oa.append(x)
            ob.append(y)
    return pa.table({"a": pa.array(oa, pa.int64()), "b": pa.array(ob, pa.int64())})


_BLOOM_CHUNK_BYTES = 1 << 16  # 64 KiB bit-space chunks for the OR-reduce


def _distributed_bloom(pairs: rd.Dataset, *, n_bound: int):
    """Build the candidate-endpoint Bloom filter ON-cluster from an (a, b)
    pair Dataset: no driver-side candidate array at any size.

    Shape: the bitmap's BIT SPACE is partitioned into 64 KiB chunks; a map
    pass turns each pair block's endpoint ids into (chunk, position) rows
    (k probe positions per id, the same double-hash family the broadcast
    filter evaluates — `IntBloom.positions_for`); one ``groupby(chunk)``
    ORs each chunk across blocks in parallel; the driver assembles the
    final bitmap from ≤ m/2^19 chunk rows.  Driver state = the bitmap
    itself (the object that must be broadcast anyway), independent of the
    number of candidates or blocks.

    Sized from ``n_bound`` (an UPPER bound on distinct endpoints, e.g.
    2×pairs) — oversizing only lowers the false-positive rate, and Bloom
    false positives only admit extra docs into the request-filtered verify
    stream (wasted shingling, never a correctness change)."""
    from ..functions.sketch import IntBloom

    m_bits, k = IntBloom.sized_for(n_bound)
    chunk_bits = _BLOOM_CHUNK_BYTES * 8

    def positions(batch: pa.Table) -> pa.Table:
        ids = np.unique(
            np.concatenate(
                [
                    batch.column("a").combine_chunks().to_numpy(zero_copy_only=False),
                    batch.column("b").combine_chunks().to_numpy(zero_copy_only=False),
                ]
            )
        )
        pos = IntBloom.positions_for(ids, m_bits, k).ravel()
        return pa.table(
            {
                "chunk": pa.array((pos // chunk_bits).astype(np.int32)),
                "pos": pa.array((pos % chunk_bits).astype(np.int32)),
            }
        )

    def or_chunk(group: pa.Table) -> pa.Table:
        cid = int(group.column("chunk")[0].as_py())
        size = min(_BLOOM_CHUNK_BYTES, m_bits // 8 - cid * _BLOOM_CHUNK_BYTES)
        buf = np.zeros(size, dtype=np.uint8)
        pos = group.column("pos").combine_chunks().to_numpy(zero_copy_only=False)
        np.bitwise_or.at(buf, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pa.table(
            {
                "chunk": pa.array([cid], pa.int32()),
                "bits": pa.array([buf.tobytes()], pa.binary()),
            }
        )

    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    rows = (
        pairs.map_batches(positions, batch_format="pyarrow")
        .groupby("chunk")
        .map_groups(or_chunk, batch_format="pyarrow")
        .take_all()
    )
    for r in rows:
        off = r["chunk"] * _BLOOM_CHUNK_BYTES
        chunk = np.frombuffer(r["bits"], dtype=np.uint8)
        bits[off : off + len(chunk)] = chunk
    return IntBloom(bits, k)


def minhash_lsh_dedup(
    sf_dir: str,
    *,
    threshold: float = 0.8,
    num_partitions: int = 64,
    cc_rows_per_bucket: int | None = None,
    bloom_threshold: int = 2_000_000,
    prune_candidates: bool = True,
    collapse_exact: bool = False,
) -> rd.Dataset:
    """MinHash→LSH-band→bucket-groupby near-dup detection with exact-Jaccard
    verification, fully on-cluster.  Returns (doc_id, cluster_id) for every
    doc in a near-dup cluster (cluster_id = min doc_id of the cluster),
    sorted by doc_id.

    Scale shape — one fused lazy chain, three shuffles, zero driver
    materialization of pairs:

    1. banding groupby emits candidate pairs (possibly duplicated across
       bands);
    2. the distinct candidate endpoint ids (tiny vs corpus — O(pairs), and
       pairs are already capped per bucket) are aggregated and broadcast via
       ``ray.put``; the corpus stream is filtered to candidates BEFORE the
       verify union, so the verify shuffle carries O(candidates) text, not a
       second all-to-all of the whole corpus (at 10^12 docs the broadcast
       set becomes a Bloom filter — false positives cost a wasted shingle,
       never correctness);
    3. pair endpoints become shingle-*request* rows, unioned with the
       filtered corpus and shuffled once on ``doc_id % B`` — each bucket
       shingles only the docs that were requested (request dedup is local
       because a pair's duplicates hash to the same bucket) and re-keys the
       result by pair;
    4. the pair-keyed shuffle pivots the two shingle sides back together and
       verifies exact Jaccard; survivors stream into distributed
       connected components (`graph.connected_components`).

    ``collapse_exact=True`` is the crawl-scale path: exact duplicates
    (sha1 of the raw text) are collapsed to their minimum-doc_id
    representative BEFORE banding, near-dup runs over distinct texts only,
    and cluster labels propagate back through the exact groups
    (`_expand_exact_groups`).  A corpus with duplication factor k pays
    1/k of the banding/verify/CC work plus one narrow sha shuffle —
    measured 56 s → 6.3 s end-to-end on a 100k-doc / 20×-duplication
    stress.  Output is identical to the direct path whenever the
    per-bucket candidate cap does not bite (identical texts band
    identically, so exact groups always verify at J=1.0 and share their
    representative's component); when the cap DOES bite, the collapsed
    path has strictly better recall — the cap applies to distinct texts
    instead of being exhausted by repeated copies.  Default False: the
    dup-light bench corpus would pay the extra sha shuffle for nothing.
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    if collapse_exact:
        reps, mapping = _exact_collapse(docs)
        clusters = _minhash_clusters_over(
            reps,
            threshold=threshold,
            num_partitions=num_partitions,
            cc_rows_per_bucket=cc_rows_per_bucket,
            bloom_threshold=bloom_threshold,
            prune_candidates=prune_candidates,
        )
        return _expand_exact_groups(clusters, mapping, num_partitions).sort(
            "doc_id"
        )
    return _minhash_clusters_over(
        docs,
        threshold=threshold,
        num_partitions=num_partitions,
        cc_rows_per_bucket=cc_rows_per_bucket,
        bloom_threshold=bloom_threshold,
        prune_candidates=prune_candidates,
    ).sort("doc_id")


def _compact_pairs(pairs: rd.Dataset) -> rd.Dataset:
    """Materialize + (when small) compact a candidate-pair Dataset.

    materialize: the pair set (small) is consumed twice — once for the
    candidate-id broadcast, once as request rows — and must not recompute
    the banding chain.  The upstream per-`a` dedupe matters for both
    consumers: a pair matching in k bands is emitted k times by the banding
    stage, so without it `pairs.count()` over-states the candidate bound
    (mis-sizing the Bloom / abandoning the exact-array path early) and every
    duplicate ships two redundant shingle-request rows through the verify
    shuffle.

    Compacting a SMALL pair set out of the banding groupby's block layout
    (one tiny block per sort partition) matters because every downstream
    shuffle otherwise pays per-block fixed costs ~10x the data.  Count and
    num_blocks are metadata on the materialized set; the repartition is
    skipped entirely at scale (big pair sets keep their parallelism)."""
    pairs = pairs.materialize()
    if pairs.count() < 1_000_000 and pairs.num_blocks() > 8:
        pairs = pairs.repartition(4).materialize()
    return pairs


def _verify_candidate_pairs(
    docs: rd.Dataset,
    pairs: rd.Dataset,
    *,
    threshold: float,
    num_partitions: int,
    bloom_threshold: int,
    prune_candidates: bool,
) -> rd.Dataset:
    """Exact-Jaccard verification of a MATERIALIZED candidate (a, b) pair
    Dataset against the (doc_id, text) corpus: broadcast-filter the corpus
    to candidate endpoints, union shingle-request rows with the filtered
    corpus, shuffle once on ``doc_id % B`` to attach shingle sets, then
    shuffle once on the pair hash to pivot the two sides back together and
    keep pairs with exact shingle Jaccard ≥ threshold.  Shared by the
    whole-corpus clustering path (`_minhash_clusters_over`) and the
    incremental new-vs-indexed path (`incremental_dedup`)."""

    def _endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"id": pa.concat_arrays(
                [batch["a"].combine_chunks(), batch["b"].combine_chunks()]
            )}
        )

    if prune_candidates:
        # Candidate endpoints bounded by 2×pairs (pairs are bucket-capped).
        # Small sets: exact distinct-id array (no false positives, and the
        # driver state is bounded by bloom_threshold ids = 16 MB).  Large
        # sets: the Bloom is built ON-cluster (`_distributed_bloom`) — the
        # only driver state is the final bitmap, i.e. the broadcast payload
        # itself, never a candidate array.
        if 2 * pairs.count() > bloom_threshold:
            cand_ref = ray.put(_distributed_bloom(pairs, n_bound=2 * pairs.count()))
        else:
            # unique() returns None for an empty pair set — no candidates.
            cand_ids = (
                pairs.map_batches(_endpoints, batch_format="pyarrow").unique("id")
                or []
            )
            cand_ref = ray.put(np.array(sorted(cand_ids), dtype=np.int64))
    else:
        # Escape hatch for candidate sets too large even for a driver-built
        # Bloom: skip the broadcast entirely — the verify union/groupby is
        # itself a semi-join (unrequested docs are never shingled), it just
        # ships the whole corpus text through the shuffle again (the r2
        # behavior).
        cand_ref = None
    requests = pairs.map_batches(
        _request_rows, batch_format="pyarrow", fn_kwargs={"num_buckets": num_partitions}
    )
    corpus = docs.map_batches(
        _doc_rows,
        batch_format="pyarrow",
        fn_kwargs={"num_buckets": num_partitions, "cand_ref": cand_ref},
    )
    sided = (
        requests.union(corpus)
        .groupby("_bkt")
        .map_groups(
            _attach_shingles,
            batch_format="pyarrow",
            fn_kwargs={"num_buckets": num_partitions},
        )
    )
    return sided.groupby("_bkt").map_groups(
        _verify_pairs, batch_format="pyarrow", fn_kwargs={"threshold": threshold}
    )


def _minhash_clusters_over(
    docs: rd.Dataset,
    *,
    threshold: float,
    num_partitions: int,
    cc_rows_per_bucket: int | None,
    bloom_threshold: int,
    prune_candidates: bool,
) -> rd.Dataset:
    """The banding→verify→CC core of `minhash_lsh_dedup` over an arbitrary
    (doc_id, text) dataset; returns UNSORTED (doc_id, cluster_id)."""
    bands = docs.map_batches(_band_rows, batch_format="pyarrow")
    pairs = _compact_pairs(
        bands.groupby("cb")
        .map_groups(_coarse_bucket_pairs, batch_format="pyarrow")
        .groupby("a")
        .map_groups(_dedupe_pair_group, batch_format="pyarrow")
    )
    verified = _verify_candidate_pairs(
        docs,
        pairs,
        threshold=threshold,
        num_partitions=num_partitions,
        bloom_threshold=bloom_threshold,
        prune_candidates=prune_candidates,
    )
    cc_kw = {"rows_per_bucket": cc_rows_per_bucket} if cc_rows_per_bucket else {}
    return connected_components(verified, **cc_kw)


# ---------------------------------------------------------------------------
# Incremental dedup: new batch vs indexed history (no history re-clustering)
# ---------------------------------------------------------------------------

INCREMENTAL_SPLIT_MOD = 8  # doc_id % MOD == MOD-1 → "incoming batch"; else history


def _coin_new_side(doc: np.ndarray, *, test_frac: float) -> np.ndarray:
    """The `sampling.hash_split` TEST assignment as a boolean mask: the
    salt-'s' md5 coin against ``u >= 1 - test_frac`` — byte-identical to
    the split operator so the audit sees exactly the split's test set."""
    from .sampling import temperature_coin

    return temperature_coin(doc.tolist(), salt="s") >= 1.0 - test_frac


def _cross_side_pairs(
    group: pa.Table,
    *,
    side_kind: str = "mod",
    split_mod: int = INCREMENTAL_SPLIT_MOD,
    test_frac: float = 0.05,
) -> pa.Table:
    """All (band, bhash) runs of one coarse bucket → (a=NEW doc, b=OLD doc)
    cross pairs only — the incremental analog of `_coarse_bucket_pairs`.

    Side is derived from the doc_id itself, so the banding stage needs no
    schema change: ``side_kind="mod"`` marks ``doc_id % split_mod ==
    split_mod - 1`` as incoming (the daily-batch shape), ``side_kind=
    "coin"`` marks the `hash_split` test coin (the leakage-audit shape).
    Per run each side is independently capped at the first MAX_BUCKET
    ascending doc_ids (same deterministic skew guard, logged); new×new and
    old×old pairs are never emitted — history is already deduplicated by
    assumption, and the incoming batch dedupes against itself via the
    whole-corpus operators."""
    band = group.column("band").combine_chunks().to_numpy(zero_copy_only=False)
    doc = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
    bh = np.asarray(group.column("bhash").to_pylist(), dtype=object)
    if len(doc) == 0:
        return _EMPTY_PAIRS
    order = np.lexsort((doc, bh, band))
    band, doc, bh = band[order], doc[order], bh[order]
    if side_kind == "mod":
        new_side = (doc % split_mod) == (split_mod - 1)
    elif side_kind == "coin":
        new_side = _coin_new_side(doc, test_frac=test_frac)
    else:  # pragma: no cover - programming error
        raise ValueError(f"unknown side_kind: {side_kind!r}")
    first = np.concatenate([[True], (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])])
    starts = np.nonzero(first)[0]
    ends = np.concatenate([starts[1:], [len(doc)]])
    a_parts, b_parts = [], []
    for s0, e0 in zip(starts, ends):
        seg_new = doc[s0:e0][new_side[s0:e0]]
        seg_old = doc[s0:e0][~new_side[s0:e0]]
        if len(seg_new) == 0 or len(seg_old) == 0:
            continue
        for name, seg in (("new", seg_new), ("old", seg_old)):
            if len(seg) > MAX_BUCKET:
                logger.warning(
                    "incremental LSH bucket (band=%s, key=%s) has %d %s docs; "
                    "keeping first %d, dropping %d",
                    band[s0],
                    bh[s0],
                    len(seg),
                    name,
                    MAX_BUCKET,
                    len(seg) - MAX_BUCKET,
                )
        seg_new = seg_new[:MAX_BUCKET]
        seg_old = seg_old[:MAX_BUCKET]
        a_parts.append(np.repeat(seg_new, len(seg_old)))
        b_parts.append(np.tile(seg_old, len(seg_new)))
    if not a_parts:
        return _EMPTY_PAIRS
    return pa.table(
        {
            "a": pa.array(np.concatenate(a_parts)),
            "b": pa.array(np.concatenate(b_parts)),
        }
    )


def incremental_dedup(
    sf_dir: str,
    *,
    threshold: float = 0.8,
    split_mod: int = INCREMENTAL_SPLIT_MOD,
    num_partitions: int = 64,
    bloom_threshold: int = 2_000_000,
    prune_candidates: bool = True,
) -> rd.Dataset:
    """Dedup an INCOMING batch against an already-indexed history without
    re-clustering the history — the production shape of daily-crawl
    ingestion (each increment is checked against the accumulated corpus;
    the accumulated corpus is never re-banded against itself).

    The deterministic split ``doc_id % split_mod == split_mod - 1`` marks
    the incoming batch (1/8 of the corpus by default); the rest is history.
    Returns one row per incoming doc that has a verified near-duplicate in
    history: (doc_id, dup_of = MIN matching history doc_id), sorted by
    doc_id.

    Scale shape — identical shuffle bill to `minhash_lsh_dedup` minus the
    CC stage, and the pair set is strictly smaller (old×old and new×new
    runs emit nothing):

    1. ONE banding pass over the whole table (`_band_rows` — at real scale
       the history side's band rows come from the stored index, so the
       daily cost is the increment only; here both sides are derived from
       the one documents table to stay self-contained);
    2. the coarse-bucket groupby emits only cross-side candidate pairs,
       capped per (band, bhash) run per side (`_cross_side_pairs`);
    3. the shared `_verify_candidate_pairs` chain broadcast-filters the
       corpus to candidate endpoints and exact-Jaccard-verifies each pair;
    4. survivors fold to MIN history id per incoming doc via the
       hash-bucket `fold_by_key` (no CC: the output is a bipartite match,
       not a clustering).

    Oracle: pinned digest from the independent sequential
    `oracle_dedup.incremental_matches` (gate: ``incremental_dedup_digest``).
    """
    return _cross_match(
        sf_dir,
        side_kwargs={"side_kind": "mod", "split_mod": split_mod},
        out_col="dup_of",
        threshold=threshold,
        num_partitions=num_partitions,
        bloom_threshold=bloom_threshold,
        prune_candidates=prune_candidates,
    )


def _cross_match(
    sf_dir: str,
    *,
    side_kwargs: dict,
    out_col: str,
    threshold: float,
    num_partitions: int,
    bloom_threshold: int,
    prune_candidates: bool,
) -> rd.Dataset:
    """Shared band→cross-pair→verify→min-fold chain behind
    `incremental_dedup` and `split_leakage_audit`; returns sorted
    (doc_id, <out_col>) rows — one per NEW-side doc with a verified
    OLD-side near-duplicate."""
    from .fold import fold_by_key

    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    bands = docs.map_batches(_band_rows, batch_format="pyarrow")
    pairs = _compact_pairs(
        bands.groupby("cb")
        .map_groups(
            _cross_side_pairs,
            batch_format="pyarrow",
            fn_kwargs=side_kwargs,
        )
        .groupby("a")
        .map_groups(_dedupe_pair_group, batch_format="pyarrow")
    )
    verified = _verify_candidate_pairs(
        docs,
        pairs,
        threshold=threshold,
        num_partitions=num_partitions,
        bloom_threshold=bloom_threshold,
        prune_candidates=prune_candidates,
    )
    folded = fold_by_key(verified, key="a", cols=["b"], ops=["min"])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("a"), out_col: batch.column("b")}
        )

    return folded.map_batches(rename, batch_format="pyarrow").sort("doc_id")


def split_leakage_audit(
    sf_dir: str,
    *,
    threshold: float = 0.8,
    test_frac: float = 0.05,
    num_partitions: int = 64,
    bloom_threshold: int = 2_000_000,
    prune_candidates: bool = True,
) -> rd.Dataset:
    """Contamination audit across the `sampling.hash_split` boundary: every
    TEST document with a verified MinHash near-duplicate in train/val, and
    the smallest such train/val doc_id — the eval-set-leakage check a
    training pipeline runs after splitting (`decontaminate` checks a known
    benchmark list; this checks the split against its own corpus).

    The test side is recomputed from the split's own salt-'s' md5 coin
    (``u >= 1 - test_frac``, byte-identical to `hash_split`), so the audit
    needs no join against the split output.  Same shuffle bill as
    `incremental_dedup` — one banding pass, cross-side-only candidate
    pairs (capped, logged), the shared exact-Jaccard verify chain, one
    min-fold.  Returns (doc_id, leaked_from) sorted by doc_id.

    Oracle: pinned digest from the independent sequential
    `oracle_dedup.leakage_matches` (gate: ``split_leakage_digest``).
    """
    return _cross_match(
        sf_dir,
        side_kwargs={"side_kind": "coin", "test_frac": test_frac},
        out_col="leaked_from",
        threshold=threshold,
        num_partitions=num_partitions,
        bloom_threshold=bloom_threshold,
        prune_candidates=prune_candidates,
    )


def split_leakage_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `split_leakage_audit` (oracle:
    oracle_dedup.leakage_matches — the pinned-literal pattern)."""
    from .interpret import fold_digest

    ds = split_leakage_audit(sf_dir, **kwargs)

    def payload(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array(
                    [str(c) for c in batch["leaked_from"].to_pylist()], pa.string()
                ),
            }
        )

    return fold_digest(ds.map_batches(payload, batch_format="pyarrow"), "payload")


def incremental_dedup_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `incremental_dedup` (oracle:
    oracle_dedup.incremental_matches — same pinned-literal pattern as
    `minhash_digest`)."""
    from .interpret import fold_digest

    ds = incremental_dedup(sf_dir, **kwargs)

    def payload(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array(
                    [str(c) for c in batch["dup_of"].to_pylist()], pa.string()
                ),
            }
        )

    return fold_digest(ds.map_batches(payload, batch_format="pyarrow"), "payload")


NUM_EXACT_BUCKETS = 64


def _exact_collapse(
    docs: rd.Dataset, *, twin_if=None
) -> tuple[rd.Dataset, rd.Dataset]:
    """Collapse exact duplicates (sha1 of the raw text, nulls as ''):
    returns ``(reps, mapping)`` — reps: one (doc_id, text) row per distinct
    text (the group's minimum doc_id); mapping: (doc_id, rep, twin) for
    EVERY doc, twin = the doc's exact group has ≥ 2 members.  One
    corpus-text shuffle keyed on sha-derived buckets (the same shape as
    `exact_dedup`), vectorized keep-first inside each bucket.

    ``twin_if(text_array) -> bool ndarray``: optional extra per-doc
    condition AND-ed into ``twin`` — a sketch whose "identical texts
    always link" guarantee has exceptions (winnowing: a text that
    normalizes to '' has an EMPTY fingerprint set and can never link, so
    its exact group must not self-cluster) masks those docs out here."""

    def sha_rows(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch.column("text"), "")
        sha = [hashlib.sha1(s.encode("utf-8")).digest() for s in t.to_pylist()]
        bkt = (
            np.array([int.from_bytes(h[:4], "big") for h in sha], dtype=np.int64)
            % NUM_EXACT_BUCKETS
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": t,
                "sha": pa.array(sha, pa.binary()),
                "bkt": pa.array(bkt),
            }
        )

    def collapse(group: pa.Table) -> pa.Table:
        sha = np.asarray(group.column("sha").to_pylist(), dtype=object)
        doc = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, sha))
        sd, dd_ = sha[order], doc[order]
        first = np.concatenate([[True], sd[1:] != sd[:-1]])
        gid = np.cumsum(first) - 1
        rep_first = dd_[np.nonzero(first)[0]]  # min doc_id per group
        sizes = np.bincount(gid)
        rep = np.empty_like(doc)
        twin = np.empty(len(doc), dtype=bool)
        rep[order] = rep_first[gid]
        twin[order] = (sizes > 1)[gid]
        if twin_if is not None:
            twin &= twin_if(group.column("text").combine_chunks())
        return pa.table(
            {
                "doc_id": group.column("doc_id"),
                "text": group.column("text"),
                "rep": pa.array(rep, pa.int64()),
                "twin": pa.array(twin),
            }
        )

    out = (
        docs.map_batches(sha_rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(collapse, batch_format="pyarrow")
        .materialize()
    )
    def rep_rows(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("doc_id"), batch.column("rep"))
        return batch.filter(mask).select(["doc_id", "text"])

    reps = out.map_batches(rep_rows, batch_format="pyarrow")
    mapping = out.select_columns(["doc_id", "rep", "twin"])
    return reps, mapping


def _expand_exact_groups(
    clusters: rd.Dataset, mapping: rd.Dataset, num_buckets: int
) -> rd.Dataset:
    """Propagate representative-level cluster labels back to every member
    of each exact group — a bucketed hash-join on ``rep`` (no driver
    state): docs whose rep is in a near-dup component inherit its label;
    docs in a size-≥2 exact group whose rep has no other partner form
    their own cluster labelled by the rep (identical copies always verify
    at J = 1.0); singleton docs with unclustered reps emit nothing."""

    def tag_clusters(batch: pa.Table) -> pa.Table:
        key = batch.column("doc_id").combine_chunks()
        n = batch.num_rows
        kv = np.asarray(key.to_pylist(), dtype=np.int64)
        return pa.table(
            {
                "key": key,
                "doc_id": pa.nulls(n, pa.int64()),
                "twin": pa.nulls(n, pa.bool_()),
                "label": batch.column("cluster_id"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "_bkt": pa.array(kv % num_buckets, pa.int64()),
            }
        )

    def tag_mapping(batch: pa.Table) -> pa.Table:
        key = batch.column("rep").combine_chunks()
        n = batch.num_rows
        kv = np.asarray(key.to_pylist(), dtype=np.int64)
        return pa.table(
            {
                "key": key,
                "doc_id": batch.column("doc_id"),
                "twin": batch.column("twin"),
                "label": pa.nulls(n, pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "_bkt": pa.array(kv % num_buckets, pa.int64()),
            }
        )

    def join(group: pa.Table) -> pa.Table:
        side = group.column("side").combine_chunks().to_numpy(zero_copy_only=False)
        key = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)

        def _filled(col: str, fill) -> np.ndarray:
            return (
                pc.fill_null(group.column(col).combine_chunks(), fill)
                .to_numpy(zero_copy_only=False)
            )

        lab = _filled("label", -1).astype(np.int64)
        doc = _filled("doc_id", -1).astype(np.int64)
        twin = _filled("twin", False).astype(bool)
        m0 = side == 0
        k0, l0 = key[m0], lab[m0]
        o0 = np.argsort(k0)
        k0s, l0s = k0[o0], l0[o0]
        m1 = ~m0
        k1, d1, t1 = key[m1], doc[m1], twin[m1]
        if len(k0s):
            pos = np.minimum(np.searchsorted(k0s, k1), len(k0s) - 1)
            found = k0s[pos] == k1
            label = np.where(found, l0s[pos], k1)
        else:
            found = np.zeros(len(k1), dtype=bool)
            label = k1
        emit = found | t1
        return pa.table(
            {
                "doc_id": pa.array(d1[emit], pa.int64()),
                "cluster_id": pa.array(label[emit], pa.int64()),
            }
        )

    tagged = clusters.map_batches(tag_clusters, batch_format="pyarrow").union(
        mapping.map_batches(tag_mapping, batch_format="pyarrow")
    )
    return tagged.groupby("_bkt").map_groups(join, batch_format="pyarrow")


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


def simhash_batch(texts: list[str | None]) -> np.ndarray:
    """Batch SimHash, byte-identical to per-doc `simhash64` (equality
    property-tested): the per-doc distinct-word features come from ONE RE2
    word split + ``dictionary_encode`` + np.unique over (row, code) pairs
    (no per-doc findall/set loop), one blake2b per DISTINCT word per batch
    (words repeat heavily across documents), and ONE vectorized
    bit-majority over the concatenated feature array (`np.add.reduceat`
    per doc segment) instead of a per-doc matrix.  Integer sums are
    order-independent, so the result is exactly
    `[simhash64(t) for t in texts]` at a fraction of the per-doc cost."""
    from ..functions.tokenize import WORD_SPLIT, explode_tokens

    n = len(texts)
    sigs = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return sigs
    rows, codes, dic = explode_tokens(texts, pattern=WORD_SPLIT, lower=True)
    if not len(rows):
        return sigs
    ndic = len(dic)
    ucomb = np.unique(rows * ndic + codes)  # distinct (doc, word) features
    frows, fcodes = ucomb // ndic, ucomb % ndic
    wh = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            for w in dic.to_pylist()
        ),
        dtype=np.uint64,
        count=ndic,
    )
    # ±1 bit matrix computed ONCE per distinct word (int8), then gathered
    pm_u = (
        2
        * ((wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int8)
        - 1
    )
    counts = np.bincount(frows, minlength=n)
    nz = np.nonzero(counts)[0]
    starts = np.concatenate([[0], np.cumsum(counts[nz])[:-1]])
    gathered = pm_u[fcodes].astype(np.int32)
    v = np.add.reduceat(gathered, starts, axis=0)  # (len(nz), 64)
    sigs[nz] = ((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
        axis=1
    )
    return sigs


def _simhash_band_rows(batch: pa.Table) -> pa.Table:
    """4 bands × 16 bits: hamming ≤ 3 ⟹ at least one identical band."""
    doc_ids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
    sigs = simhash_batch(batch.column("text").to_pylist())
    n = len(doc_ids)
    bands = np.repeat(np.arange(4, dtype=np.int32), n)
    sig4 = np.tile(sigs, 4)
    bval = ((sig4 >> (16 * bands.astype(np.uint64))) & np.uint64(0xFFFF)).astype(
        np.int32
    )
    return pa.table(
        {
            "band": pa.array(bands),
            "bval": pa.array(bval),
            "doc_id": pa.array(np.tile(doc_ids, 4)),
            "sig": pa.array(sig4),
        }
    )


def simhash_dedup(
    sf_dir: str,
    *,
    max_hamming: int = 3,
    num_partitions: int = 16,
    cc_rows_per_bucket: int | None = None,
    collapse_exact: bool = False,
) -> rd.Dataset:
    """SimHash banding near-dup: (doc_id, cluster_id) rows, like minhash.

    Hamming verification happens inside the band bucket (the signature rides
    along with each band row), so the verified pair set goes straight to
    distributed min-label propagation — no driver materialization.

    ``collapse_exact=True`` is the same crawl-scale path as
    `minhash_lsh_dedup`'s: sha1-collapse exact duplicates first (identical
    texts have identical signatures, so exact groups always band together
    at Hamming 0), run the banding over distinct texts, expand labels back
    through the groups — byte-identical when bucket caps don't bite,
    strictly better recall when they do.
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    if collapse_exact:
        reps, mapping = _exact_collapse(docs)
        clusters = _simhash_clusters_over(
            reps,
            max_hamming=max_hamming,
            cc_rows_per_bucket=cc_rows_per_bucket,
        )
        return _expand_exact_groups(clusters, mapping, num_partitions).sort(
            "doc_id"
        )
    return _simhash_clusters_over(
        docs, max_hamming=max_hamming, cc_rows_per_bucket=cc_rows_per_bucket
    ).sort("doc_id")


def _simhash_clusters_over(
    docs: rd.Dataset,
    *,
    max_hamming: int,
    cc_rows_per_bucket: int | None,
) -> rd.Dataset:
    """The banding→Hamming-verify→CC core of `simhash_dedup` over an
    arbitrary (doc_id, text) dataset; returns UNSORTED (doc_id, cluster_id)."""
    bands = docs.map_batches(_simhash_band_rows, batch_format="pyarrow")

    def _pairs(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("doc_id").to_pylist(), group.column("sig").to_pylist())
        )
        if len(rows) > MAX_BUCKET:
            logger.warning(
                "SimHash bucket (band=%s, bval=%s) has %d docs; keeping first %d, dropping %d",
                group.column("band")[0].as_py(),
                group.column("bval")[0].as_py(),
                len(rows),
                MAX_BUCKET,
                len(rows) - MAX_BUCKET,
            )
            rows = rows[:MAX_BUCKET]
        a, b = [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ham = bin(rows[i][1] ^ rows[j][1]).count("1")
                if ham <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    pairs = bands.groupby(["band", "bval"]).map_groups(_pairs, batch_format="pyarrow")
    # Duplicate edges across bands are harmless to connected_components.
    cc_kw = {"rows_per_bucket": cc_rows_per_bucket} if cc_rows_per_bucket else {}
    return connected_components(pairs, **cc_kw)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (exact, block-pair distributed)
# ---------------------------------------------------------------------------


def embedding_near_dup(
    sf_dir: str, *, threshold: float = 0.42, block_rows: int = 2048
) -> rd.Dataset:
    """Exact all-pairs cosine near-dup over the embeddings table, distributed
    as a block-pair cartesian (no full-table broadcast, no driver take_all).

    Vectors are hashed into B = ceil(N / block_rows) blocks by vec_id; each
    vector is replicated to the B block-pairs it participates in (one shuffle
    of B × N rows), and a ``groupby(block)`` computes one block × block
    float64 matmul per group.  Every unordered pair is evaluated in exactly
    one group, so the output needs no dedup.  Returns (a, b) pairs with
    ``cos ≥ threshold`` and ``a < b``, sorted — byte-identical to the
    all-pairs DuckDB oracle.
    """
    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = emb.count()  # parquet row-count metadata, not a data scan
    nblocks = max(1, math.ceil(n / block_rows))

    def replicate(batch: pa.Table) -> pa.Table:
        vid = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        p = vid % nblocks
        q = np.arange(nblocks, dtype=np.int64)
        i = np.minimum(p[:, None], q[None, :])
        j = np.maximum(p[:, None], q[None, :])
        block = (i * nblocks + j).ravel()
        row_idx = np.repeat(np.arange(len(vid)), nblocks)
        rep = batch.take(pa.array(row_idx, pa.int64()))
        return rep.append_column("block", pa.array(block, pa.int64())).append_column(
            "bucket", pa.array(np.repeat(p, nblocks).astype(np.int32))
        )

    def block_pairs(group: pa.Table) -> pa.Table:
        block = group.column("block")[0].as_py()
        bi, bj = divmod(block, nblocks)
        vid = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.asarray(group.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        bkt = np.asarray(group.column("bucket").to_pylist())
        if bi == bj:
            sims = mn @ mn.T
            ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
            va, vb = vid[ii], vid[jj]
        else:
            li, lj = bkt == bi, bkt == bj
            sims = mn[li] @ mn[lj].T
            ii, jj = np.nonzero(sims >= threshold)
            va, vb = vid[li][ii], vid[lj][jj]
        a = np.minimum(va, vb)
        b = np.maximum(va, vb)
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    # Input batch size shrinks with the replication factor so each output
    # block stays ~block_rows rows (B × batch_size) regardless of corpus
    # size — the replication never builds a multi-GB block in one task.
    return (
        emb.map_batches(
            replicate,
            batch_format="pyarrow",
            batch_size=max(64, block_rows // nblocks),
        )
        .groupby("block")
        .map_groups(block_pairs, batch_format="pyarrow")
        .sort(["a", "b"])
    )


def embedding_near_dup_clusters(
    sf_dir: str, *, threshold: float = 0.42, block_rows: int = 2048
) -> rd.Dataset:
    """Near-dup *clusters* over the embeddings table: the exact block-pair
    cosine pairs fed through distributed connected components.

    Returns (vec_id, cluster_id) for every vector in a near-dup cluster,
    cluster_id = min vec_id of the connected component, sorted by vec_id.
    This is the driver-gated exactness proof for `graph.connected_components`
    itself: the DuckDB twin recomputes the clusters with a recursive-CTE
    transitive closure over the same cosine pairs.
    """

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": batch["doc_id"], "cluster_id": batch["cluster_id"]}
        )

    pairs = embedding_near_dup(sf_dir, threshold=threshold, block_rows=block_rows)
    return (
        connected_components(pairs)
        .map_batches(rename, batch_format="pyarrow")
        .sort("vec_id")
    )


# ---------------------------------------------------------------------------
# Embedding hyperplane-LSH near-dup (the sub-quadratic scale path)
# ---------------------------------------------------------------------------

EMB_LSH_BANDS = 48
EMB_LSH_BITS = 4
EMB_LSH_SEED = 20260817
EMB_LSH_MAX_BUCKET = 512

_EMB_PLANES_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def _emb_lsh_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Seeded hyperplanes, regenerated deterministically in every worker
    process (n_planes × dim floats, 192×64 at the defaults — cheaper to
    recompute than to broadcast)."""
    key = (dim, n_planes, seed)
    if key not in _EMB_PLANES_CACHE:
        _EMB_PLANES_CACHE[key] = np.random.default_rng(seed).standard_normal(
            (n_planes, dim)
        )
    return _EMB_PLANES_CACHE[key]


def _emb_band_rows(
    batch: pa.Table, *, num_bands: int, band_bits: int, seed: int
) -> pa.Table:
    """Replicate each vector to its ``num_bands`` band rows with a combined
    ``bkt = band * 2^band_bits + band_value`` group key.  The raw embedding
    rides along (float32 list, ~256 B) so the bucket verify needs no second
    corpus pass; all arithmetic (normalize → project → sign) is float64 and
    batching-independent (per-row ops + a margin-checked sign decision)."""
    vid_col = batch.column("vec_id")
    if len(vid_col) == 0:
        return batch.select(["vec_id", "embedding"]).append_column(
            "bkt", pa.array([], pa.int32())
        )
    m = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    mn = m / norms[:, None]
    planes = _emb_lsh_planes(m.shape[1], num_bands * band_bits, seed)
    bits = (mn @ planes.T) > 0
    n = len(vid_col)
    bv = (
        bits.reshape(n, num_bands, band_bits).astype(np.int64)
        * (1 << np.arange(band_bits, dtype=np.int64))
    ).sum(axis=2)
    bkt = (
        np.arange(num_bands, dtype=np.int64)[None, :] * (1 << band_bits) + bv
    ).ravel()
    rep = batch.select(["vec_id", "embedding"]).take(
        pa.array(np.repeat(np.arange(n, dtype=np.int64), num_bands))
    )
    # Drop the parquet-origin pandas metadata: the shuffle's schema-dedup
    # can't hash it and logs a warning per reduce task otherwise.
    return rep.replace_schema_metadata(None).append_column(
        "bkt", pa.array(bkt.astype(np.int32))
    )


def _emb_bucket_pairs(
    group: pa.Table, *, threshold: float, max_bucket: int
) -> pa.Table:
    """Exact float64 cosine verify inside one band bucket: vec_id-sorted,
    capped (logged), one bucket × bucket matmul — emits (a, b) with a < b.
    Bucket-matmul vs the oracle's per-pair dot is safe because the measured
    |cos − threshold| margin (≥3.4e-5 at sf0.1) dwarfs summation noise."""
    vid = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
    order = np.argsort(vid)
    if len(order) > max_bucket:
        logger.warning(
            "embedding-LSH bucket %s has %d vectors; keeping first %d, dropping %d",
            group.column("bkt")[0].as_py(),
            len(order),
            max_bucket,
            len(order) - max_bucket,
        )
        order = order[:max_bucket]
    m = np.asarray(group.column("embedding").to_pylist(), dtype=np.float64)[order]
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    mn = m / norms[:, None]
    sims = mn @ mn.T
    ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
    v = vid[order]
    return pa.table(
        {"a": pa.array(v[ii], pa.int64()), "b": pa.array(v[jj], pa.int64())}
    )


def embedding_near_dup_lsh(
    sf_dir: str,
    *,
    threshold: float = 0.42,
    num_bands: int = EMB_LSH_BANDS,
    band_bits: int = EMB_LSH_BITS,
    seed: int = EMB_LSH_SEED,
    max_bucket: int = EMB_LSH_MAX_BUCKET,
    cc_rows_per_bucket: int | None = None,
) -> rd.Dataset:
    """Sub-quadratic embedding near-dup clusters: random-hyperplane LSH
    banding → in-bucket exact cosine verify → distributed connected
    components.  Returns (vec_id, cluster_id = min vec_id of component),
    sorted — the scale path beside the exact O(N²) ``embedding_near_dup``.

    Scale shape: ONE shuffle of ``num_bands`` × (vec_id + raw float32
    embedding) per vector (~13 KB/vec at dim 64/48 bands — at 10^12 vectors,
    swap the riding vector for `minhash_lsh_dedup`'s candidate-endpoint
    fetch scheme, which this module already proves out), then the verified
    pair Dataset streams into per-bucket contraction CC.  No driver
    materialization anywhere.  Buckets are vec_id-capped at ``max_bucket``
    with a logged warning (skew guard — same contract as MinHash/SimHash).

    Tuning: P(band collision) = p^band_bits with p = 1 − acos(cos)/π; at the
    gate threshold 0.42 (p ≈ 0.64), 48 bands × 4 bits give measured recall
    1.0 vs the exact operator at sf0.01 AND sf0.1.  Higher thresholds (real
    near-dup, ≥0.9 ⟹ p ≥ 0.93) allow band_bits 8–16, which is what keeps
    buckets bounded at web scale.

    Digest-gated against the independent sequential
    `oracle_dedup.embedding_lsh_clusters` (same seeded planes, per-pair
    verify, union-find); decision-exactness margins are documented there.
    """
    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    bands = emb.map_batches(
        _emb_band_rows,
        batch_format="pyarrow",
        fn_kwargs={"num_bands": num_bands, "band_bits": band_bits, "seed": seed},
    )
    pairs = bands.groupby("bkt").map_groups(
        _emb_bucket_pairs,
        batch_format="pyarrow",
        fn_kwargs={"threshold": threshold, "max_bucket": max_bucket},
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": batch["doc_id"], "cluster_id": batch["cluster_id"]}
        )

    cc_kw = {"rows_per_bucket": cc_rows_per_bucket} if cc_rows_per_bucket else {}
    return (
        connected_components(pairs, **cc_kw)
        .map_batches(rename, batch_format="pyarrow")
        .sort("vec_id")
    )


def embedding_lsh_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `embedding_near_dup_lsh`
    (oracle: oracle_dedup.embedding_lsh_clusters)."""
    ds = embedding_near_dup_lsh(sf_dir, **kwargs)

    def as_doc(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["vec_id"], "cluster_id": batch["cluster_id"]}
        )

    return _cluster_digest(ds.map_batches(as_doc, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (exact all-pairs baseline, block-pair distributed)
# ---------------------------------------------------------------------------

_SHINGLE_SEP = "\x1f"


def _trigram_set(text: str) -> set[str]:
    """Raw word-trigram strings (no hashing — the SQL twin compares the same
    strings, so no crc-collision daylight between the two sides).  A wordless
    text yields ``{""}``, exactly like the SQL twin's
    ``[array_to_string([], ' ')]`` branch."""
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < 3:
        return {" ".join(words)}
    return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}


def ngram_jaccard_pairs(
    sf_dir: str,
    *,
    threshold: float = 0.8,
    block_rows: int = 1024,
    id_mod: int | None = None,
) -> rd.Dataset:
    """Exact all-pairs word-trigram Jaccard near-dup pairs (the n-gram dedup
    baseline), distributed as the same block-pair cartesian as
    ``embedding_near_dup``.

    Each doc's trigram set rides through the one replication shuffle as a
    single separator-joined string; within a block pair, candidates are
    pruned by the size-ratio bound implied by the threshold
    (``J ≥ t ⟹ min(|A|,|B|)/max(|A|,|B|) ≥ t``, exactness-preserving)
    before the exact set intersection.  Returns (a, b) with ``J ≥ t``,
    ``a < b``, sorted — byte-identical to the DuckDB ``list_intersect``
    twin.  Like the embedding baseline this is O(N²) *work* spread over
    B² tasks: the exact small-side oracle twin; the scale path for unknown-N
    corpora is ``minhash_lsh_dedup``.
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    if id_mod is not None:
        # deterministic 1/id_mod subset — the dedup_eval harness's sample
        _mod = int(id_mod)

        def _subset(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(ids % _mod == 0))

        docs = docs.map_batches(_subset, batch_format="pyarrow")
    n = docs.count()
    nblocks = max(1, math.ceil(n / block_rows))

    def replicate(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        texts = batch.column("text").to_pylist()
        sh = [_SHINGLE_SEP.join(sorted(_trigram_set(t))) for t in texts]
        p = ids % nblocks
        q = np.arange(nblocks, dtype=np.int64)
        i = np.minimum(p[:, None], q[None, :])
        j = np.maximum(p[:, None], q[None, :])
        block = (i * nblocks + j).ravel()
        row_idx = np.repeat(np.arange(len(ids)), nblocks)
        return pa.table(
            {
                "block": pa.array(block, pa.int64()),
                "bucket": pa.array(np.repeat(p, nblocks).astype(np.int32)),
                "doc_id": pa.array(ids[row_idx], pa.int64()),
                "sh": pa.array([sh[r] for r in row_idx], pa.string()),
            }
        )

    def block_pairs(group: pa.Table) -> pa.Table:
        block = group.column("block")[0].as_py()
        bi, bj = divmod(block, nblocks)
        ids = np.asarray(group.column("doc_id").to_pylist(), dtype=np.int64)
        # Unconditional split: the serialized form of the wordless-text set
        # {""} is the empty string, which must round-trip back to {""}.
        shs = [set(s.split(_SHINGLE_SEP)) for s in group.column("sh").to_pylist()]
        sizes = np.array([len(s) for s in shs])
        bkt = np.asarray(group.column("bucket").to_pylist())
        if bi == bj:
            li = np.arange(len(ids))
            lj = li
        else:
            li = np.nonzero(bkt == bi)[0]
            lj = np.nonzero(bkt == bj)[0]
        oa, ob = [], []
        for x in li:
            for y in lj:
                if bi == bj and y <= x:
                    continue
                sa, sb = sizes[x], sizes[y]
                if min(sa, sb) < threshold * max(sa, sb):
                    continue  # size-ratio prune (implied by J >= t)
                else:
                    inter = len(shs[x] & shs[y])
                    j = inter / (sa + sb - inter)
                if j >= threshold:
                    a, b = (int(ids[x]), int(ids[y]))
                    oa.append(min(a, b))
                    ob.append(max(a, b))
        return pa.table({"a": pa.array(oa, pa.int64()), "b": pa.array(ob, pa.int64())})

    return (
        docs.map_batches(
            replicate,
            batch_format="pyarrow",
            batch_size=max(64, block_rows // nblocks),
        )
        .groupby("block")
        .map_groups(block_pairs, batch_format="pyarrow")
        .sort(["a", "b"])
    )


def containment_pairs(
    sf_dir: str, *, threshold: float = 0.5, block_rows: int = 1024
) -> rd.Dataset:
    """Exact all-pairs word-trigram CONTAINMENT — Broder 1997's asymmetric
    companion to resemblance: ``C(A→B) = |S(A)∩S(B)| / |S(A)|``.  This is
    the quote / sub-document-inclusion detector a symmetric Jaccard dedup
    misses entirely: a short doc fully pasted into a long one has high
    containment but near-zero Jaccard (planted-corpus pytest exercises
    exactly that case; the sf corpus only produces mutual near-dups).

    Same block-pair cartesian + one replication shuffle as
    ``ngram_jaccard_pairs``; candidates are pruned by the one-sided size
    bound implied by the threshold (``C ≥ t ⟹ |B| ≥ t·|A|``, since the
    intersection is capped by ``min(|A|,|B|)``) before the exact set
    intersection.  Returns ORDERED (a = contained, b = container) pairs
    with ``C ≥ t``, ``a ≠ b``, sorted — byte-identical to the DuckDB
    ``list_intersect`` twin.  Exact small-side oracle twin by design
    (O(N²) work over B² tasks); the scale path for unknown-N corpora is
    the MinHash band family.
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    n = docs.count()
    nblocks = max(1, math.ceil(n / block_rows))

    def replicate(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        texts = batch.column("text").to_pylist()
        sh = [_SHINGLE_SEP.join(sorted(_trigram_set(t))) for t in texts]
        p = ids % nblocks
        q = np.arange(nblocks, dtype=np.int64)
        i = np.minimum(p[:, None], q[None, :])
        j = np.maximum(p[:, None], q[None, :])
        block = (i * nblocks + j).ravel()
        row_idx = np.repeat(np.arange(len(ids)), nblocks)
        return pa.table(
            {
                "block": pa.array(block, pa.int64()),
                "bucket": pa.array(np.repeat(p, nblocks).astype(np.int32)),
                "doc_id": pa.array(ids[row_idx], pa.int64()),
                "sh": pa.array([sh[r] for r in row_idx], pa.string()),
            }
        )

    def block_pairs(group: pa.Table) -> pa.Table:
        block = group.column("block")[0].as_py()
        bi, bj = divmod(block, nblocks)
        ids = np.asarray(group.column("doc_id").to_pylist(), dtype=np.int64)
        shs = [set(s.split(_SHINGLE_SEP)) for s in group.column("sh").to_pylist()]
        sizes = np.array([len(s) for s in shs])
        bkt = np.asarray(group.column("bucket").to_pylist())
        if bi == bj:
            sides = [(np.arange(len(ids)), np.arange(len(ids)))]
        else:
            li = np.nonzero(bkt == bi)[0]
            lj = np.nonzero(bkt == bj)[0]
            sides = [(li, lj), (lj, li)]  # ordered pairs: both directions
        oa, ob = [], []
        for xs, ys in sides:
            for x in xs:
                for y in ys:
                    if y == x:
                        continue
                    sa, sb = int(sizes[x]), int(sizes[y])
                    if sb < threshold * sa:
                        continue  # one-sided size prune (C >= t needs it)
                    if len(shs[x] & shs[y]) / sa >= threshold:
                        oa.append(int(ids[x]))
                        ob.append(int(ids[y]))
        return pa.table({"a": pa.array(oa, pa.int64()), "b": pa.array(ob, pa.int64())})

    return (
        docs.map_batches(
            replicate,
            batch_format="pyarrow",
            batch_size=max(64, block_rows // nblocks),
        )
        .groupby("block")
        .map_groups(block_pairs, batch_format="pyarrow")
        .sort(["a", "b"])
    )


def ppjoin_jaccard_pairs(
    sf_dir: str,
    *,
    threshold: float = 0.8,
    num_buckets: int = 64,
    sort: bool = True,
) -> rd.Dataset:
    """Exact word-trigram Jaccard pairs via the PPJoin PREFIX FILTER (Xiao
    et al. 2008, public) — the scale path for the same semantics as
    `ngram_jaccard_pairs` (whose block-pair cartesian is O(N²) work by
    design).  Identical output, pytest-pinned equal.

    Scale shape — candidate work tracks near-duplication, not N²:

    1. each doc emits only its ``|A| - ⌊t·|A|⌋ + 1`` prefix trigrams under
       a GLOBAL md5 gram order (hash order needs no df pass and no
       vocabulary-sized broadcast — the documented trade vs the canonical
       rarest-first order, which prunes better but requires a gram-rank
       table); two docs with J ≥ t MUST share a prefix gram (≤ suffix-size
       common grams otherwise — fewer than the overlap bound t·|A| forces);
    2. ONE gram-bucket shuffle pairs prefix-sharers per gram (md5 keys,
       never gram text), then a pair-bucket shuffle dedupes candidates;
    3. two co-partition attach shuffles fetch each side's trigram set by
       doc_id bucket (payload linear in corpus + candidates — sets are
       NEVER replicated per prefix row), and the verify kernel applies the
       SAME float size-ratio prune + float Jaccard test as the exact twin.
    """
    t = threshold
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    B = num_buckets

    def sets_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        texts = batch.column("text").to_pylist()
        sh = [_SHINGLE_SEP.join(sorted(_trigram_set(x))) for x in texts]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "sh": pa.array(sh, pa.string()),
            }
        )

    sets = docs.map_batches(sets_rows, batch_format="pyarrow").materialize()
    # compact when small (the copurchase/CC compaction rule): the set rows
    # re-enter TWO attach exchanges, and 64 near-empty blocks make each
    # pay per-block fixed costs; at web scale the count guard keeps the
    # corpus-sized set list at its natural block count
    if sets.count() < 2_000_000:
        sets = sets.repartition(8).materialize()

    def prefix_rows(batch: pa.Table) -> pa.Table:
        # md5 runs only over the batch's UNIQUE grams (dictionary-encoded —
        # grams repeat heavily across near-dup docs); the per-doc prefix
        # selection is pure numpy segment arithmetic.  Order key = full md5
        # hex, identical to sorting each doc's digests directly.
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        joined = batch.column("sh").to_pylist()
        gram_lists = [j.split(_SHINGLE_SEP) for j in joined]
        counts = np.array([len(g) for g in gram_lists], dtype=np.int64)
        flat: list[str] = [g for gl in gram_lists for g in gl]
        enc = pa.array(flat, pa.string()).dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        hexes = np.array(
            [hashlib.md5(u.encode("utf-8")).hexdigest() for u in enc.dictionary.to_pylist()]
        )
        bkt_u = np.array([int(h[:8], 16) % B for h in hexes], dtype=np.int64)
        rank = np.empty(len(hexes), dtype=np.int64)
        rank[np.argsort(hexes, kind="stable")] = np.arange(len(hexes))
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        order = np.lexsort((rank[codes], doc_idx))  # doc blocks, md5-sorted within
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(len(order), dtype=np.int64) - np.repeat(starts, counts)
        p = counts - np.floor(t * counts).astype(np.int64) + 1  # conservative
        sel = order[pos < np.repeat(p, counts)]
        sel_codes = codes[sel]
        return pa.table(
            {
                "bkt": pa.array(bkt_u[sel_codes]),
                "key": pa.array(ids[doc_idx[sel]]),
                "gram": pa.array(hexes[sel_codes], pa.string()),
            }
        )

    def pair_up(group: pa.Table) -> pa.Table:
        keys = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(group.column("gram").combine_chunks())
        code = np.asarray(enc.indices, dtype=np.int64)
        order = np.argsort(code, kind="stable")
        oc = code[order]
        starts = np.flatnonzero(np.r_[True, oc[1:] != oc[:-1]])
        ends = np.r_[starts[1:], len(oc)]
        a_out, b_out = [], []
        for s0, s1 in zip(starts, ends):
            m = s1 - s0
            if m < 2:
                continue
            if m > 4096:
                logger.warning(
                    "ppjoin prefix bucket holds %d docs — %d candidate pairs",
                    m, m * (m - 1) // 2,
                )
            idx = order[s0:s1]
            ii, jj = np.triu_indices(m, 1)
            ka, kb = keys[idx[ii]], keys[idx[jj]]
            a_out.append(np.minimum(ka, kb))
            b_out.append(np.maximum(ka, kb))
        a = np.concatenate(a_out) if a_out else np.empty(0, np.int64)
        b = np.concatenate(b_out) if b_out else np.empty(0, np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        # in-bucket pre-dedup (same pair via several grams of one bucket),
        # then key by the a-side DOC bucket: the global dedupe runs inside
        # the stage-1 attach (all copies of (a, b) share a), so the old
        # dedicated pair-bucket shuffle disappears — one less all-to-all
        # barrier, which dominated this pipeline's wall at sf0.1.
        if len(a):
            pairs = np.empty(len(a), dtype=[("a", np.int64), ("b", np.int64)])
            pairs["a"], pairs["b"] = a, b
            u = np.unique(pairs)
            a, b = u["a"], u["b"]
        return pa.table(
            {
                "jbkt": pa.array(a % B),
                "a": pa.array(a),
                "b": pa.array(b),
            }
        )

    cand = (
        sets.map_batches(prefix_rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(pair_up, batch_format="pyarrow")
    )

    # --- two co-partition attach shuffles, then the exact float verify -----
    # unified row layout for the attach/verify buckets:
    #   kind 0 = candidate (a, b, sh_a?), kind 1 = set row (a = doc_id, sh)
    def _row_table(jbkt, kind, a, b, sh, sh_a) -> pa.Table:
        return pa.table(
            {
                "jbkt": jbkt,
                "kind": kind,
                "a": a,
                "b": b,
                "sh": sh,
                "sh_a": sh_a,
            }
        )

    def _dbkt(col: pa.ChunkedArray | pa.Array) -> pa.Array:
        return pc.cast(
            pc.subtract(col, pc.multiply(pc.divide(col, B), B)), pa.int64()
        )

    def cand_rows_keyed_a(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _row_table(
            _dbkt(batch.column("a")),
            pa.array(np.zeros(n, np.int64)),
            batch.column("a"),
            batch.column("b"),
            pa.nulls(n, pa.string()),
            pa.nulls(n, pa.string()),
        )

    def set_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _row_table(
            _dbkt(batch.column("doc_id")),
            pa.array(np.ones(n, np.int64)),
            batch.column("doc_id"),
            pa.array(np.zeros(n, np.int64)),
            batch.column("sh"),
            pa.nulls(n, pa.string()),
        )

    def _lut(group: pa.Table, kind: np.ndarray) -> dict[int, str]:
        is_set = kind == 1
        ids = np.asarray(group.column("a").to_pylist())[is_set]
        shs = [s for s, m in zip(group.column("sh").to_pylist(), is_set) if m]
        return {int(d): s for d, s in zip(ids, shs)}

    def attach_a(group: pa.Table) -> pa.Table:
        kind = group.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
        lut = _lut(group, kind)
        g = group.filter(pa.array(kind == 0))
        # global candidate dedupe, fused here: every copy of (a, b) shares
        # a and therefore this jbkt (replaces the old pair-bucket shuffle)
        ga = g.column("a").combine_chunks().to_numpy(zero_copy_only=False)
        gb = g.column("b").combine_chunks().to_numpy(zero_copy_only=False)
        if len(ga):
            pairs = np.empty(len(ga), dtype=[("a", np.int64), ("b", np.int64)])
            pairs["a"], pairs["b"] = ga, gb
            _, first = np.unique(pairs, return_index=True)
            g = g.take(pa.array(np.sort(first)))
        b_col = g.column("b")
        n = g.num_rows
        return _row_table(
            _dbkt(b_col),  # re-key by the OTHER side for stage 2
            pa.array(np.zeros(n, np.int64)),
            g.column("a"),
            b_col,
            pa.nulls(n, pa.string()),
            pa.array(
                [lut.get(int(x)) for x in g.column("a").to_pylist()], pa.string()
            ),
        )

    def verify(group: pa.Table) -> pa.Table:
        kind = group.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
        lut = _lut(group, kind)
        g = group.filter(pa.array(kind == 0))
        oa, ob = [], []
        for a, b, sha in zip(
            g.column("a").to_pylist(),
            g.column("b").to_pylist(),
            g.column("sh_a").to_pylist(),
        ):
            sa = set(sha.split(_SHINGLE_SEP))
            sb = set(lut[int(b)].split(_SHINGLE_SEP))
            na, nb = len(sa), len(sb)
            if min(na, nb) < threshold * max(na, nb):
                continue  # same float size-ratio prune as the exact twin
            inter = len(sa & sb)
            if inter / (na + nb - inter) >= threshold:
                oa.append(a)
                ob.append(b)
        return pa.table({"a": pa.array(oa, pa.int64()), "b": pa.array(ob, pa.int64())})

    stage1 = (
        cand.map_batches(cand_rows_keyed_a, batch_format="pyarrow")
        .union(sets.map_batches(set_rows, batch_format="pyarrow"))
        .groupby("jbkt")
        .map_groups(attach_a, batch_format="pyarrow")
    )
    out = (
        stage1.union(sets.map_batches(set_rows, batch_format="pyarrow"))
        .groupby("jbkt")
        .map_groups(verify, batch_format="pyarrow")
    )
    # sort=False lets audit consumers (agreement matrix, dup matrix) skip
    # this whole all-to-all barrier: they re-bucket the pairs anyway
    return out.sort(["a", "b"]) if sort else out


# ---------------------------------------------------------------------------
# Winnowing near-dup (Schleimer et al., SIGMOD'03 — the MOSS approach)
# ---------------------------------------------------------------------------


def winnow_near_dup(
    sf_dir: str,
    *,
    overlap: float = 0.5,
    k: int = 8,
    window: int = 16,
    cc_rows_per_bucket: int | None = None,
    collapse_exact: bool = False,
) -> rd.Dataset:
    """Near-dup clusters via winnowed k-gram fingerprints: documents whose
    shared winnowed hashes cover ≥ ``overlap`` of the SMALLER fingerprint
    set are linked, links are clustered with distributed connected
    components.  Returns (doc_id, cluster_id) sorted by doc_id.

    Unlike MinHash (which estimates whole-document Jaccard), winnowing
    guarantees detection of any shared run ≥ k + window - 1 chars — the
    containment/plagiarism detector: a doc pasted INSIDE a larger one still
    scores high against the smaller side's fingerprints.

    Scale shape (all shuffles are fingerprint- or pair-sized, the corpus
    text never leaves the first map):

    1. one map pass emits (fp, doc_id, n_fp) rows — ~|text|/((window+1)/2)
       winnowed hashes per doc;
    2. a groupby on ``fp % 256`` processes ALL fingerprint groups of a hash
       bucket in one vectorized call (runs of equal fp found with one
       lexsort — never one Python call per distinct fingerprint), emitting
       (a, b, na, nb, shared) rows pre-combined per pair WITHIN the bucket
       (per-fp groups capped at MAX_BUCKET, logged, like LSH);
    3. a second coarse groupby on ``hash(a, b) % 256`` sums the per-bucket
       partial `shared` counts vectorized (np.add.reduceat over pair runs
       — NOT a groupby over millions of single-pair groups, which costs
       ~20x the whole pipeline) and filters
       shared / min(na, nb) ≥ overlap into edges in the same call;
    4. `graph.connected_components`.

    Rows-only at the driver gate (a 64-bit rolling hash is not reasonably
    ANSI-SQL-expressible); semantics pinned by the planted-containment
    pytest.

    ``collapse_exact=True``: same crawl-scale exact-dup pre-collapse as
    the MinHash/SimHash paths (identical texts have identical winnowed
    fingerprint sets, so exact groups link at overlap 1.0 — except texts
    that normalize to '', whose fingerprint set is EMPTY; those are masked
    out of the twin fallback so the collapsed path stays byte-identical to
    the direct one, which never emits them).
    """
    from ..functions.textstats import winnow_fingerprint_np

    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    mapping = None
    if collapse_exact:
        # A text that normalizes to '' has an EMPTY winnowed fingerprint set
        # and can never link — its exact group must not self-cluster (the
        # direct path never emits such docs).
        def _has_fp(texts: pa.Array) -> np.ndarray:
            trimmed = pc.utf8_trim(texts, " \t\n\f\r")
            return np.asarray(pc.not_equal(trimmed, ""), dtype=bool)

        docs, mapping = _exact_collapse(docs, twin_if=_has_fp)

    num_fp_buckets = 256

    def fp_rows(batch: pa.Table) -> pa.Table:
        # winnow_fingerprint_np: vectorized rolling hash + sliding argmin
        # (value-identical to the scalar reference, property-tested); the
        # remaining per-doc work is one np.unique per doc.
        parts, out_doc, out_n = [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            fps = np.unique(winnow_fingerprint_np(t or "", k=k, window=window))
            if len(fps):
                parts.append(fps)
                out_doc.extend([d] * len(fps))
                out_n.extend([len(fps)] * len(fps))
        fpa = (
            np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
        )
        return pa.table(
            {
                "fp": pa.array(fpa),
                "bucket": pa.array((fpa % num_fp_buckets).astype(np.int32)),
                "doc_id": pa.array(out_doc, pa.int64()),
                "n_fp": pa.array(out_n, pa.int64()),
            }
        )

    def _col(group: pa.Table, name: str, dtype) -> np.ndarray:
        return group.column(name).combine_chunks().to_numpy(zero_copy_only=False).astype(dtype, copy=False)

    def _pair_runs(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(sort order, run starts) for rows grouped by the (a, b) pair."""
        order = np.lexsort((b, a))
        sa, sb = a[order], b[order]
        if len(sa) == 0:
            return order, np.array([], dtype=np.int64)
        new = np.concatenate([[True], (np.diff(sa) != 0) | (np.diff(sb) != 0)])
        return order, np.nonzero(new)[0]

    def bucket_shared(group: pa.Table) -> pa.Table:
        """All fp-groups of one hash bucket in a single call (a per-distinct-fp
        map_groups would be one Python call per fingerprint — the classic tiny-
        groups trap).  Runs of equal fp are found vectorized; pair emission per
        qualifying run uses triu_indices; pairs are pre-combined (partial
        `shared` sums) within the bucket before the shuffle."""
        fp = _col(group, "fp", np.uint64)
        doc = _col(group, "doc_id", np.int64)
        nfp = _col(group, "n_fp", np.int64)
        order = np.lexsort((doc, fp))
        fp, doc, nfp = fp[order], doc[order], nfp[order]
        cuts = np.nonzero(np.diff(fp))[0] + 1
        starts = np.concatenate([[0], cuts]).astype(np.int64)
        ends = (
            np.concatenate([cuts, [len(fp)]]).astype(np.int64)
            if len(fp)
            else np.array([], dtype=np.int64)
        )
        a_parts, b_parts, na_parts, nb_parts = [], [], [], []
        for s0, e0 in zip(starts, ends):
            m = e0 - s0
            if m < 2:
                continue
            if m > MAX_BUCKET:
                logger.warning(
                    "winnow fp group (fp=%s) has %d docs; keeping first %d, dropping %d",
                    fp[s0],
                    m,
                    MAX_BUCKET,
                    m - MAX_BUCKET,
                )
                e0 = s0 + MAX_BUCKET
                m = MAX_BUCKET
            ii, jj = np.triu_indices(m, k=1)
            a_parts.append(doc[s0 + ii])
            b_parts.append(doc[s0 + jj])
            na_parts.append(nfp[s0 + ii])
            nb_parts.append(nfp[s0 + jj])
        if not a_parts:
            return pa.table(
                {
                    "pb": pa.array([], pa.int32()),
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "na": pa.array([], pa.int64()),
                    "nb": pa.array([], pa.int64()),
                    "shared": pa.array([], pa.int64()),
                }
            )
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        na = np.concatenate(na_parts)
        nb = np.concatenate(nb_parts)
        # combine duplicate pairs within this fp bucket before the shuffle
        order, run_starts = _pair_runs(a, b)
        a, b, na, nb = a[order], b[order], na[order], nb[order]
        shared = np.add.reduceat(np.ones(len(a), dtype=np.int64), run_starts)
        a, b, na, nb = a[run_starts], b[run_starts], na[run_starts], nb[run_starts]
        pb = ((a * np.int64(0x9E3779B1) + b) % num_fp_buckets).astype(np.int32)
        return pa.table(
            {
                "pb": pa.array(pb),
                "a": pa.array(a),
                "b": pa.array(b),
                "na": pa.array(na),
                "nb": pa.array(nb),
                "shared": pa.array(shared),
            }
        )

    def pair_combine(group: pa.Table) -> pa.Table:
        """Sum the per-bucket partial shared counts for every pair of one
        coarse pair-bucket in a single vectorized call, then apply the
        overlap threshold — replaces a groupby over millions of single-pair
        groups (measured 28 s vs <1 s at sf0.1)."""
        a = _col(group, "a", np.int64)
        b = _col(group, "b", np.int64)
        na = _col(group, "na", np.int64)
        nb = _col(group, "nb", np.int64)
        sh = _col(group, "shared", np.int64)
        order, run_starts = _pair_runs(a, b)
        a, b, na, nb, sh = a[order], b[order], na[order], nb[order], sh[order]
        shared = np.add.reduceat(sh, run_starts) if len(a) else sh
        a, b = a[run_starts], b[run_starts]
        na, nb = na[run_starts], nb[run_starts]
        keep = shared >= overlap * np.minimum(na, nb)
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    edge_ds = (
        docs.map_batches(fp_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_shared, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(pair_combine, batch_format="pyarrow")
    )

    cc_kw = {"rows_per_bucket": cc_rows_per_bucket} if cc_rows_per_bucket else {}
    cc = connected_components(edge_ds, **cc_kw)
    if mapping is not None:
        return _expand_exact_groups(cc, mapping, NUM_EXACT_BUCKETS).sort("doc_id")
    return cc.sort("doc_id")


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540)
# ---------------------------------------------------------------------------

SEMANTIC_MAX_CLUSTER = 4096


def semantic_dedup(
    sf_dir: str,
    *,
    threshold: float = 0.42,  # the synthetic corpus's near-dup regime,
    # same default as embedding_near_dup (real text embeddings: ~0.95+)
    num_clusters: int = 8,
    iters: int = 4,
) -> rd.Dataset:
    """SemDeDup: k-means the embedding space, then within each cluster drop
    every vector whose cosine similarity to an already-retained vector
    (vec_id ascending — the deterministic keep-first policy, same as
    ``exact_dedup``) exceeds ``threshold``.  Returns the RETAINED rows as
    (vec_id, cluster), sorted by vec_id.

    This is the scale path for embedding near-dup removal: the quadratic
    similarity work is confined to clusters (the paper's core trick), so
    total work is ``Σ |cluster|²`` instead of N².  Shape:

    1. deterministic broadcast/partial-aggregate k-means
       (`ann._kmeans_centroids` — driver folds k×blocks partials only);
    2. one assignment pass attaches the cluster id (broadcast centroids);
    3. ``groupby(cluster).map_groups`` runs the greedy keep-first scan per
       cluster — the pairwise matrix is cluster-local, each retained row
       eliminates all its later neighbors in one vectorized step.  Clusters
       over ``SEMANTIC_MAX_CLUSTER`` rows are truncated and logged (at real
       scale: raise ``num_clusters`` so E[|cluster|] = N/k stays bounded —
       the paper uses k ≈ sqrt(N)).

    Greedy keep-first (not connected components) is the paper's semantics:
    a chain a~b~c with sim(a,c) < threshold keeps {a, c}, whereas
    `embedding_near_dup_clusters` (transitive closure) would collapse it
    to {a}.  No SQL oracle (iterative k-means upstream); determinism and
    planted-duplicate recovery are pytest-verified.
    """
    from .ann import _assign_batch, _kmeans_centroids

    # Materialized so the assignment scan below reuses the pinned blocks
    # the centroid iterations already built (see _kmeans_centroids).
    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    centroids = _kmeans_centroids(emb, k=num_clusters, iters=iters)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        _, a = _assign_batch(batch, cref)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "embedding": batch.column("embedding"),
                "cluster": pa.array(a.astype(np.int32)),
            }
        )

    def cluster_dedup(group: pa.Table) -> pa.Table:
        vid = group.column("vec_id").combine_chunks().to_numpy(zero_copy_only=False)
        m = np.array(group.column("embedding").to_pylist(), dtype=np.float64)
        order = np.argsort(vid)
        vid, m = vid[order], m[order]
        n = len(vid)
        if n > SEMANTIC_MAX_CLUSTER:
            logger.warning(
                "semantic_dedup cluster %s has %d rows; keeping first %d, dropping %d",
                group.column("cluster")[0].as_py(),
                n,
                SEMANTIC_MAX_CLUSTER,
                n - SEMANTIC_MAX_CLUSTER,
            )
            vid, m, n = vid[:SEMANTIC_MAX_CLUSTER], m[:SEMANTIC_MAX_CLUSTER], SEMANTIC_MAX_CLUSTER
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        sims = mn @ mn.T
        keep = np.ones(n, dtype=bool)
        later = np.arange(n)
        for i in range(n):
            if keep[i]:
                keep[(later > i) & (sims[i] > threshold)] = False
        cl = group.column("cluster")[0].as_py() if n else None
        return pa.table(
            {
                "vec_id": pa.array(vid[keep]),
                "cluster": pa.array(
                    np.full(int(keep.sum()), cl, dtype=np.int32)
                ),
            }
        )

    return (
        emb.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(cluster_dedup, batch_format="pyarrow")
        .sort("vec_id")
    )

# ---------------------------------------------------------------------------
# Corpus digests: hash-gating the sketch-based cluster surfaces
# ---------------------------------------------------------------------------


def _cluster_digest(ds: rd.Dataset) -> pa.Table:
    """(doc_id, cluster_id) Dataset → 1-row order-independent corpus digest
    (`interpret.fold_digest` over payload = str(cluster_id)).

    The matching literal in `__ray_entry__.oracle_sql()` is pinned from the
    independent sequential oracle (`ocr_engine_ray.oracle_dedup`), so these
    turn the non-SQL-expressible cluster surfaces (64-bit rolling hashes,
    MinHash signatures) into hash-gated CORRECTNESS rows — the same pattern
    as `rich_fields_digest`."""
    from .interpret import fold_digest

    def payload(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array(
                    [str(c) for c in batch["cluster_id"].to_pylist()], pa.string()
                ),
            }
        )

    return fold_digest(ds.map_batches(payload, batch_format="pyarrow"), "payload")


def minhash_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `minhash_lsh_dedup` (oracle: oracle_dedup.minhash_clusters)."""
    return _cluster_digest(minhash_lsh_dedup(sf_dir, **kwargs))


def simhash_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `simhash_dedup` (oracle: oracle_dedup.simhash_clusters)."""
    return _cluster_digest(simhash_dedup(sf_dir, **kwargs))


def winnow_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `winnow_near_dup` (oracle: oracle_dedup.winnow_clusters)."""
    return _cluster_digest(winnow_near_dup(sf_dir, **kwargs))


# ---------------------------------------------------------------------------
# Normalization + exact dedup (the CCNet-style "normalize then hash" pass)
# ---------------------------------------------------------------------------


def normalized_dedup(sf_dir: str) -> rd.Dataset:
    """Exact dedup AFTER aggressive text normalization (lowercase, strip
    punctuation, collapse whitespace) — the CCNet-style pass that catches
    trivially-reformatted copies exact hashing misses.

    Normalization runs entirely in RE2-backed pyarrow kernels
    (`replace_substring_regex`) so it is bit-identical to the DuckDB twin's
    ``regexp_replace(..., 'g')`` chain — no Python-regex/RE2 class drift
    (the `\\s`-vs-`[ \\t\\n\\f\\r]` lesson from the token counters).  Then
    the same sha1-bucket keep-first shuffle as `exact_dedup`.  Returns
    surviving (doc_id, source), sorted by doc_id.
    """
    import pyarrow.compute as pc

    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def norm_sha(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch.column("text"), "")
        t = pc.utf8_lower(t)
        t = pc.replace_substring_regex(t, r"[^\w \t\n\f\r]+", "")
        t = pc.replace_substring_regex(t, r"[ \t\n\f\r]+", " ")
        t = pc.utf8_trim(t, " ")
        h = [hashlib.sha1(x.encode("utf-8")).hexdigest() for x in t.to_pylist()]
        bucket = [int(x[:8], 16) % NUM_DEDUP_BUCKETS for x in h]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "text_sha1": pa.array(h, pa.string()),
                "bucket": pa.array(bucket, pa.int32()),
            }
        )

    return (
        ds.map_batches(norm_sha, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_dedup_bucket, batch_format="pyarrow")
        .sort("doc_id")
    )


def semantic_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `semantic_dedup`.  Pinnable for the same reason as
    `ann.kmeans_digest` (bit-deterministic quantized centroid fold) plus a
    measured ~1.7e-3 min |cosine - threshold| margin in the greedy keep-first
    scan.  Literal from `oracle_dedup.semantic_keep`."""
    from .interpret import fold_digest

    ds = semantic_dedup(sf_dir, **kwargs)

    def payload(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("vec_id"),
                "payload": pa.array(
                    [str(c) for c in batch.column("cluster").to_pylist()], pa.string()
                ),
            }
        )

    return fold_digest(ds.map_batches(payload, batch_format="pyarrow"), "payload")


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup (the CCNet / RefinedWeb sub-document pass)
# ---------------------------------------------------------------------------


def paragraph_dedup(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Corpus-wide paragraph-level exact dedup, keep-first: every
    ``"\\n\\n"``-separated paragraph survives only at its first occurrence
    across the whole corpus (first by ``(doc_id, position)``); later copies
    — licence blocks, boilerplate headers, navigation chrome — are dropped.
    This is the sub-document granularity pass of CCNet/RefinedWeb-style
    curation, distinct from doc-level `exact_dedup`/`normalized_dedup` and
    from the positional gram signal of `duplicate_ngram_spans`.

    Returns the per-doc reconstruction stats a downstream filter consumes:
    ``(doc_id, n_paras, n_kept, kept_chars)`` sorted by doc_id.

    Scale shape — two shuffles, both pre-aggregated map-side:

    1. explode pass: ``(bkt, sha, doc_id, ord, plen)`` rows where ``sha`` is
       the paragraph's sha1 and ``bkt = int(sha[:8], 16) % num_buckets`` —
       the paragraph TEXT never crosses the wire, only its 20-byte hash;
    2. per-bucket winner pass: one lexsort over (sha, doc_id, ord) finds
       each paragraph's first instance (run starts), then per-doc PARTIAL
       sums collapse the bucket to ≤ one row per (bucket, doc) for the
    3. final doc_id groupby, which sums ≤ ``num_buckets`` partials per doc.

    SQL twin (exact): unnest-with-ordinality + ``row_number() OVER
    (PARTITION BY para ORDER BY doc_id, ord) = 1``, grouped by doc —
    sha1 equality is paragraph equality for gate purposes.
    """
    from ray.data.aggregate import Sum

    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        out_b, out_s, out_d, out_o, out_l = [], [], [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for i, para in enumerate((t or "").split("\n\n"), start=1):
                h = hashlib.sha1(para.encode("utf-8")).hexdigest()
                out_b.append(int(h[:8], 16) % num_buckets)
                out_s.append(h)
                out_d.append(d)
                out_o.append(i)
                out_l.append(len(para))
        return pa.table(
            {
                "bkt": pa.array(out_b, pa.int32()),
                "sha": pa.array(out_s, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "ord": pa.array(out_o, pa.int64()),
                "plen": pa.array(out_l, pa.int64()),
            }
        )

    def bucket_winners(group: pa.Table) -> pa.Table:
        import pandas as pd

        doc = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        ordv = group.column("ord").combine_chunks().to_numpy(zero_copy_only=False)
        plen = group.column("plen").combine_chunks().to_numpy(zero_copy_only=False)
        sha = np.asarray(group.column("sha").to_pylist(), dtype=object)
        order = np.lexsort((ordv, doc, sha))
        sha_s, doc_s, plen_s = sha[order], doc[order], plen[order]
        kept = np.concatenate([[True], sha_s[1:] != sha_s[:-1]])
        df = pd.DataFrame(
            {
                "doc_id": doc_s,
                "n_p": np.ones(len(doc_s), dtype=np.int64),
                "k_p": kept.astype(np.int64),
                "kc_p": plen_s * kept,
            }
        )
        g = df.groupby("doc_id", sort=False, as_index=False).sum()
        # drop the from_pandas metadata dict — it breaks block schema hashing
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    partials = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(bucket_winners, batch_format="pyarrow")
    )
    from .fold import fold_int_sums_by_key

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "n_paras", "n_kept", "kept_chars"])

    # exact int sums per doc via the shared hash-bucket reduceat fold
    # (identical to groupby("doc_id").aggregate(Sum) — see fold.py)
    agg = fold_int_sums_by_key(
        partials.map_batches(_rename, batch_format="pyarrow"),
        cols=["n_paras", "n_kept", "kept_chars"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_paras": batch.column("n_paras").cast(pa.int64()),
                "n_kept": batch.column("n_kept").cast(pa.int64()),
                "kept_chars": batch.column("kept_chars").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def cross_source_dup_matrix(
    sf_dir: str, *, threshold: float = 0.8, num_buckets: int = 32
) -> rd.Dataset:
    """Provenance contamination matrix: exact word-trigram Jaccard
    near-dup PAIR COUNTS between corpus slices — which sources copy from
    which (mirror detection, licensing audits, and the per-slice dedup
    budget a curation plan needs).  Pair semantics are exactly
    `ppjoin_jaccard_pairs` (prefix-filtered, sub-quadratic, pytest-pinned
    equal to the O(N²) twin definition).

    Scale shape: the candidate-sized (a, b) pair stream rides TWO
    doc_id-bucket attach shuffles against the column-pruned (doc_id,
    source) projection (a key lands wholly in its bucket — exact joins;
    sources are never broadcast), then one tiny (source, source)
    aggregate.  Returns (source_a, source_b, n_pairs) with
    source_a <= source_b lexicographically, sorted.
    """
    import functools

    from ray.data.aggregate import Sum

    # candidate-sized; pinning it decouples the ppjoin DAG from the two
    # attach exchanges (one streaming mega-DAG measured ~2× slower here),
    # and compacting kills the many-near-empty-block inheritance that
    # makes each later exchange pay per-block fixed costs (the
    # connected-components compaction rule)
    pairs = (
        ppjoin_jaccard_pairs(sf_dir, threshold=threshold, sort=False)
        .repartition(8)
        .materialize()
    )
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "source"])

    def doc_rows(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array((did % num_buckets).astype(np.int64)),
                "key": pa.array(did.astype(np.int64)),
                "other": pa.array(np.zeros(len(did), np.int64)),
                "src": batch.column("source").cast(pa.string()),
                "carry": pa.array([""] * len(did), pa.string()),
                "kind": pa.array(np.ones(len(did), np.int64)),
            }
        )

    def pair_rows(batch: pa.Table, *, key_col: str, other_col: str) -> pa.Table:
        k = batch.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        o = batch.column(other_col).combine_chunks().to_numpy(zero_copy_only=False)
        carry = (
            batch.column("carry").to_pylist()
            if "carry" in batch.column_names
            else [""] * len(k)
        )
        return pa.table(
            {
                "bkt": pa.array((k % num_buckets).astype(np.int64)),
                "key": pa.array(k.astype(np.int64)),
                "other": pa.array(o.astype(np.int64)),
                "src": pa.array([""] * len(k), pa.string()),
                "carry": pa.array(carry, pa.string()),
                "kind": pa.array(np.zeros(len(k), np.int64)),
            }
        )

    def attach(group: pa.Table) -> pa.Table:
        kind = group.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
        key = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        is_doc = kind == 1
        src_of = dict(
            zip(
                key[is_doc].tolist(),
                (
                    s
                    for s, d in zip(group.column("src").to_pylist(), is_doc.tolist())
                    if d
                ),
            )
        )
        pk = key[~is_doc]
        po = group.column("other").combine_chunks().to_numpy(zero_copy_only=False)[
            ~is_doc
        ]
        pc_carry = [
            c
            for c, d in zip(group.column("carry").to_pylist(), is_doc.tolist())
            if not d
        ]
        return pa.table(
            {
                # the attached source rides in `carry`; `other` becomes the
                # NEXT attach key
                "a": pa.array(pk.astype(np.int64)),
                "b": pa.array(po.astype(np.int64)),
                "carry": pa.array(
                    [src_of[int(k)] for k in pk] if len(pk) else [], pa.string()
                ),
                "prev": pa.array(pc_carry, pa.string()),
            }
        )

    # attach source of `a` (key=a), then source of `b` (key=b); s1 is
    # candidate-sized — pin + compact it so the second exchange starts
    # from a few dense blocks, not the first exchange's partition count
    s1 = (
        pairs.map_batches(
            functools.partial(pair_rows, key_col="a", other_col="b"),
            batch_format="pyarrow",
        )
        .union(docs.map_batches(doc_rows, batch_format="pyarrow"))
        .groupby("bkt")
        .map_groups(attach, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )

    def rekey(batch: pa.Table) -> pa.Table:
        # after attach #1: a=pair.a, b=pair.b, carry=src_a; flip so the
        # second attach keys on b and carries src_a forward
        return pa.table(
            {
                "a": batch.column("b"),
                "b": batch.column("a"),
                "carry": batch.column("carry"),
            }
        )

    s2 = (
        s1.map_batches(rekey, batch_format="pyarrow")
        .map_batches(
            functools.partial(pair_rows, key_col="a", other_col="b"),
            batch_format="pyarrow",
        )
        .union(docs.map_batches(doc_rows, batch_format="pyarrow"))
        .groupby("bkt")
        .map_groups(attach, batch_format="pyarrow")
    )

    def to_matrix(batch: pa.Table) -> pa.Table:
        src_b = batch.column("carry").to_pylist()  # attached this round
        src_a = batch.column("prev").to_pylist()  # carried from round 1
        lo = [min(x, y) for x, y in zip(src_a, src_b)]
        hi = [max(x, y) for x, y in zip(src_a, src_b)]
        return pa.table(
            {
                "source_a": pa.array(lo, pa.string()),
                "source_b": pa.array(hi, pa.string()),
                "one": pa.array(np.ones(len(lo), np.int64)),
            }
        )

    agg = (
        s2.map_batches(to_matrix, batch_format="pyarrow")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("one", alias_name="n_pairs"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source_a": batch.column("source_a"),
                "source_b": batch.column("source_b"),
                "n_pairs": batch.column("n_pairs").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["source_a", "source_b"]
    )


def dup_cluster_sizes(sf_dir: str, *, threshold: float = 0.42) -> rd.Dataset:
    """Near-duplicate cluster-SIZE distribution over the embedding corpus —
    the dedup report a dataset card publishes (how much mass sits in
    2-copies vs 100-copy pileups decides the dedup budget).  Singletons
    (vectors in no near-dup pair) are counted from the corpus total minus
    clustered members, so the distribution covers the whole table.

    Scale shape: exact cosine pairs → distributed CC (both existing
    bucketed paths); cluster sizes are one cluster-keyed aggregate over
    (vec_id, cluster_id) rows; the size histogram is a
    cluster-count-sized fold.  Returns (cluster_size, n_clusters,
    n_vectors) sorted by cluster_size; recursive-CTE twin.
    """
    from ray.data.aggregate import Count

    from .graph import connected_components

    total = sf_table(sf_dir, "embeddings", columns=["vec_id"]).count()
    pairs = embedding_near_dup(sf_dir, threshold=threshold)
    cc = connected_components(pairs)  # (doc_id, cluster_id)

    sizes = (
        cc.groupby("cluster_id").aggregate(Count(alias_name="sz")).take_all()
    )  # clusters-sized (≤ corpus/2 rows; at gate scale tiny)
    from collections import Counter

    hist: Counter = Counter(int(r["sz"]) for r in sizes)
    clustered = sum(s * n for s, n in hist.items())
    if total - clustered > 0:
        hist[1] += total - clustered
    out_sizes = sorted(hist)
    return rd.from_arrow(
        pa.table(
            {
                "cluster_size": pa.array(out_sizes, pa.int64()),
                "n_clusters": pa.array([hist[s] for s in out_sizes], pa.int64()),
                "n_vectors": pa.array(
                    [s * hist[s] for s in out_sizes], pa.int64()
                ),
            }
        )
    )


def dedup_rate_by_source(sf_dir: str, *, num_buckets: int = 32) -> rd.Dataset:
    """Exact-duplicate rate per corpus slice: per source, total docs vs
    distinct normalized texts (sha1 identity, the `exact_dedup` key) and
    the redundancy rate — the per-slice dedup budget line in a dataset
    card (`dup_cluster_sizes` gives the shape; this gives the slice
    attribution).

    Scale shape: per-batch (source, sha1) distinct partials → ONE
    hash-bucket shuffle counts distinct keys per source per bucket (a key
    lands wholly in its bucket, so the per-source sum is exact); totals
    ride as tiny scalar partials in the same stream.  Returns
    (source, n_docs, n_distinct, dup_rate_ppm) with
    dup_rate_ppm = ⌊(n_docs − n_distinct)·10⁶ / n_docs⌋, sorted by source.
    """
    import hashlib as _hl

    from ray.data.aggregate import Sum

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        import pandas as pd

        src = batch.column("source").to_pylist()
        txt = batch.column("text").to_pylist()
        keys = [
            _hl.sha1((t or "").encode("utf-8")).hexdigest() for t in txt
        ]
        df = pd.DataFrame({"source": src, "key": keys})
        tot = df.groupby("source", sort=False).size().reset_index(name="n")
        dist = df.drop_duplicates(["source", "key"])
        bkt = [int(k[:8], 16) % num_buckets for k in dist["key"]]
        t1 = pa.table(
            {
                "kind": pa.array(np.zeros(len(tot), np.int64)),
                "bkt": pa.array(np.zeros(len(tot), np.int64)),
                "source": pa.array(tot["source"], pa.string()),
                "key": pa.array([""] * len(tot), pa.string()),
                "n": pa.array(tot["n"].to_numpy(np.int64)),
            }
        )
        t2 = pa.table(
            {
                "kind": pa.array(np.ones(len(dist), np.int64)),
                "bkt": pa.array(np.array(bkt, np.int64)),
                "source": pa.array(dist["source"], pa.string()),
                "key": pa.array(dist["key"], pa.string()),
                "n": pa.array(np.zeros(len(dist), np.int64)),
            }
        )
        return pa.concat_tables([t1, t2])

    def bucket_fold(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.select(["kind", "source", "key", "n"]).to_pandas()
        docs = (
            df[df["kind"] == 0].groupby("source", sort=False)["n"].sum().reset_index()
        )
        dist = (
            df[df["kind"] == 1]
            .drop_duplicates(["source", "key"])
            .groupby("source", sort=False)
            .size()
            .reset_index(name="d")
        )
        out = docs.merge(dist, on="source", how="outer").fillna(0)
        return pa.table(
            {
                "source": pa.array(out["source"].astype(str), pa.string()),
                "n": pa.array(out["n"].to_numpy(np.int64)),
                "d": pa.array(out["d"].to_numpy(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n_docs"), Sum("d", alias_name="n_distinct"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        nn = (
            batch.column("n_docs")
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        dd = (
            batch.column("n_distinct")
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        rate = (nn - dd) * 1_000_000 // np.maximum(nn, 1)
        return pa.table(
            {
                "source": batch.column("source"),
                "n_docs": pa.array(nn),
                "n_distinct": pa.array(dd),
                "dup_rate_ppm": pa.array(rate.astype(np.int64)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("source")


def dedup_method_agreement(
    sf_dir: str,
    *,
    jaccard_threshold: float = 0.8,
    cosine_threshold: float = 0.42,
) -> rd.Dataset:
    """Method-agreement audit between the two EXACT near-dup signals:
    word-trigram Jaccard pairs over document text vs cosine pairs over
    the aligned embeddings — how much of each method's candidate mass the
    other confirms (the ensemble-dedup calibration every curation plan
    should look at before trusting a single detector).

    Scale shape: both pair streams are the existing sub-quadratic /
    blocked exact paths; agreement is one pair-keyed bucket groupby over
    the tagged union of the two candidate-sized streams.  Returns one
    row (n_jaccard, n_cosine, n_both, jaccard_only, cosine_only).
    """
    text_pairs = ppjoin_jaccard_pairs(
        sf_dir, threshold=jaccard_threshold, sort=False
    )
    vec_pairs = embedding_near_dup(sf_dir, threshold=cosine_threshold)

    def tag(batch: pa.Table, *, kind: int, a: str, b: str) -> pa.Table:
        x = batch.column(a).cast(pa.int64())
        y = batch.column(b).cast(pa.int64())
        xa = x.combine_chunks().to_numpy(zero_copy_only=False)
        ya = y.combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    ((xa * np.int64(1_000_003) + ya) % 64).astype(np.int64)
                ),
                "a": pa.array(xa),
                "b": pa.array(ya),
                "kind": pa.array(np.full(len(xa), kind, np.int64)),
            }
        )

    import functools

    unioned = text_pairs.map_batches(
        functools.partial(tag, kind=0, a="a", b="b"), batch_format="pyarrow"
    ).union(
        vec_pairs.map_batches(
            functools.partial(tag, kind=1, a="a", b="b"), batch_format="pyarrow"
        )
    )

    def agree(group: pa.Table) -> pa.Table:
        kind = group.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
        a = group.column("a").combine_chunks().to_numpy(zero_copy_only=False)
        b = group.column("b").combine_chunks().to_numpy(zero_copy_only=False)
        maxb = int(b.max()) + 1 if len(b) else 1
        key = a * maxb + b
        jac = np.unique(key[kind == 0])
        cos = np.unique(key[kind == 1])
        both = int(np.isin(jac, cos).sum())
        return pa.table(
            {
                "n_jaccard": pa.array([len(jac)], pa.int64()),
                "n_cosine": pa.array([len(cos)], pa.int64()),
                "n_both": pa.array([both], pa.int64()),
            }
        )

    parts = unioned.groupby("bkt").map_groups(agree, batch_format="pyarrow").take_all()
    nj = sum(r["n_jaccard"] for r in parts)
    nc = sum(r["n_cosine"] for r in parts)
    nb = sum(r["n_both"] for r in parts)
    return rd.from_arrow(
        pa.table(
            {
                "n_jaccard": pa.array([nj], pa.int64()),
                "n_cosine": pa.array([nc], pa.int64()),
                "n_both": pa.array([nb], pa.int64()),
                "jaccard_only": pa.array([nj - nb], pa.int64()),
                "cosine_only": pa.array([nc - nb], pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# DBSCAN over the embedding space (exact-twin density clustering)
# ---------------------------------------------------------------------------
DBSCAN_EPS = 0.38  # cosine radius (>= — the near-dup pair convention)
DBSCAN_MIN_NBRS = 2  # core iff >= this many eps-neighbors (self excluded)


def dbscan_clusters(
    sf_dir: str,
    *,
    eps: float = DBSCAN_EPS,
    min_nbrs: int = DBSCAN_MIN_NBRS,
    block_rows: int = 2048,
    num_buckets: int = 32,
) -> rd.Dataset:
    """DBSCAN (Ester et al. 1996) over the embeddings table: density
    clustering with an EXACT recursive-CTE twin — core points (≥
    ``min_nbrs`` cosine-eps neighbors) cluster by core-core connectivity,
    border points attach to the smallest cluster among their core
    neighbors, everything else is noise.

    Scale shape: the eps-neighbor pairs come from the block-pair cartesian
    (`embedding_near_dup` — the exact small-side oracle twin; at unknown-N
    scale the pair stage swaps for the LSH-banded variant, same contract
    as the dedup family).  The pair set — sparse by the density threshold,
    materialized ONCE — then drives per-node degree folds and three
    tagged-union bucket joins (coreness onto both endpoints, cluster ids
    onto border edges, roles onto the id scan); CC runs on core-core
    edges only.  Nothing corpus-sized ever reaches the driver.

    Returns (vec_id, role, cluster_id) for EVERY vector, role ∈
    {core, border, noise}, noise cluster_id = −1, sorted by vec_id.
    """
    from .fold import fold_by_key
    from .graph import connected_components

    pairs = embedding_near_dup(
        sf_dir, threshold=eps, block_rows=block_rows
    ).materialize()  # sparse by construction; consumed by three stages

    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks().to_numpy(zero_copy_only=False)
        b = batch.column("b").combine_chunks().to_numpy(zero_copy_only=False)
        uv, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table(
            {"vec_id": pa.array(uv, pa.int64()), "deg": pa.array(cnt.astype(np.int64))}
        )

    deg = fold_by_key(
        pairs.map_batches(endpoints, batch_format="pyarrow"),
        key="vec_id",
        cols=["deg"],
        num_buckets=num_buckets,
    )

    def core_only(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch.column("deg"), min_nbrs)
        return pa.table({"node": batch.column("vec_id").filter(keep)})

    core = deg.map_batches(core_only, batch_format="pyarrow").materialize()

    def _mark(pairs_ds: rd.Dataset, col: str, flag: str) -> rd.Dataset:
        """Tagged-union bucket semi-join: append bool ``flag`` = (pairs
        row's ``col`` endpoint is a core node)."""

        def tag_pairs(batch: pa.Table) -> pa.Table:
            k = batch.column(col).combine_chunks().to_numpy(zero_copy_only=False)
            t = batch.append_column(
                "jbkt", pa.array((k % num_buckets).astype(np.int64))
            )
            return t.append_column("is_side", pa.array(np.zeros(len(k), np.int8)))

        def tag_core(batch: pa.Table) -> pa.Table:
            k = batch.column("node").combine_chunks().to_numpy(zero_copy_only=False)
            cols = {
                c.name: pa.nulls(len(k), c.type)
                for c in pairs_ds.schema().base_schema
            }
            cols[col] = pa.array(k, pa.int64())
            t = pa.table(cols)
            t = t.append_column("jbkt", pa.array((k % num_buckets).astype(np.int64)))
            return t.append_column("is_side", pa.array(np.ones(len(k), np.int8)))

        def join(group: pa.Table) -> pa.Table:
            side = (
                group.column("is_side").combine_chunks().to_numpy(zero_copy_only=False)
                == 1
            )
            k = group.column(col).combine_chunks().to_numpy(zero_copy_only=False)
            out = group.filter(pa.array(~side)).drop_columns(["jbkt", "is_side"])
            return out.append_column(
                flag, pa.array(np.isin(k[~side], k[side]))
            )

        return (
            pairs_ds.map_batches(tag_pairs, batch_format="pyarrow")
            .union(core.map_batches(tag_core, batch_format="pyarrow"))
            .groupby("jbkt")
            .map_groups(join, batch_format="pyarrow")
        )

    marked = _mark(_mark(pairs, "a", "ca"), "b", "cb").materialize()

    def cc_edges(batch: pa.Table) -> pa.Table:
        keep = pc.and_(batch.column("ca"), batch.column("cb"))
        f = batch.filter(keep)
        return pa.table({"a": f.column("a"), "b": f.column("b")})

    cc = connected_components(
        marked.map_batches(cc_edges, batch_format="pyarrow")
    )  # (doc_id, cluster_id) for core nodes with >= 1 core-core edge

    # core labels: CC label where present, else own id (isolated cores)
    def cc_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("doc_id"),
                "cluster": batch.column("cluster_id"),
                "from_cc": pa.array(np.ones(batch.num_rows, np.int8)),
            }
        )

    def self_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "cluster": batch.column("node"),
                "from_cc": pa.array(np.zeros(batch.num_rows, np.int8)),
            }
        )

    def pick_cc(group: pa.Table) -> pa.Table:
        n = group.column("node").combine_chunks().to_numpy(zero_copy_only=False)
        c = group.column("cluster").combine_chunks().to_numpy(zero_copy_only=False)
        f = group.column("from_cc").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((-f, n))  # per node: CC row first if it exists
        n, c = n[order], c[order]
        first = np.concatenate([[True], n[1:] != n[:-1]])
        return pa.table(
            {
                "node": pa.array(n[first], pa.int64()),
                "cluster": pa.array(c[first], pa.int64()),
            }
        )

    def nbucket(batch: pa.Table) -> pa.Table:
        k = batch.column("node").combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column("nbkt", pa.array((k % num_buckets).astype(np.int64)))

    corec = (
        cc.map_batches(cc_rows, batch_format="pyarrow")
        .union(core.map_batches(self_rows, batch_format="pyarrow"))
        .map_batches(nbucket, batch_format="pyarrow")
        .groupby("nbkt")
        .map_groups(pick_cc, batch_format="pyarrow")
        .materialize()  # one (node, cluster) row per core node — sparse
    )

    # border edges: exactly one core endpoint → (noncore, corenode)
    def half_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks().to_numpy(zero_copy_only=False)
        b = batch.column("b").combine_chunks().to_numpy(zero_copy_only=False)
        ca = batch.column("ca").combine_chunks().to_numpy(zero_copy_only=False)
        cb = batch.column("cb").combine_chunks().to_numpy(zero_copy_only=False)
        nc = np.concatenate([a[~ca & cb], b[ca & ~cb]])
        co = np.concatenate([b[~ca & cb], a[ca & ~cb]])
        return pa.table(
            {
                "noncore": pa.array(nc, pa.int64()),
                "corenode": pa.array(co, pa.int64()),
            }
        )

    halves = marked.map_batches(half_edges, batch_format="pyarrow")

    def tag_half(batch: pa.Table) -> pa.Table:
        k = batch.column("corenode").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "jbkt": pa.array((k % num_buckets).astype(np.int64)),
                "noncore": batch.column("noncore"),
                "key": pa.array(k, pa.int64()),
                "cluster": pa.array(np.full(len(k), -1, np.int64)),
                "is_label": pa.array(np.zeros(len(k), np.int8)),
            }
        )

    def tag_label(batch: pa.Table) -> pa.Table:
        k = batch.column("node").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "jbkt": pa.array((k % num_buckets).astype(np.int64)),
                "noncore": pa.array(np.full(len(k), -1, np.int64)),
                "key": pa.array(k, pa.int64()),
                "cluster": batch.column("cluster"),
                "is_label": pa.array(np.ones(len(k), np.int8)),
            }
        )

    def join_border(group: pa.Table) -> pa.Table:
        lab = group.column("is_label").combine_chunks().to_numpy(zero_copy_only=False) == 1
        k = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        cl = group.column("cluster").combine_chunks().to_numpy(zero_copy_only=False)
        nc = group.column("noncore").combine_chunks().to_numpy(zero_copy_only=False)
        lk, lc = k[lab], cl[lab]
        order = np.argsort(lk)
        lk, lc = lk[order], lc[order]
        pos = np.searchsorted(lk, k[~lab])
        return pa.table(
            {
                "node": pa.array(nc[~lab], pa.int64()),
                "cluster": pa.array(lc[pos], pa.int64()),
            }
        )

    border = fold_by_key(
        halves.map_batches(tag_half, batch_format="pyarrow")
        .union(corec.map_batches(tag_label, batch_format="pyarrow"))
        .groupby("jbkt")
        .map_groups(join_border, batch_format="pyarrow"),
        key="node",
        cols=["cluster"],
        ops=["min"],
        num_buckets=num_buckets,
    )

    # final assembly over the full id scan: core > border > noise
    ids = sf_table(sf_dir, "embeddings", columns=["vec_id"])

    def tag_ids(batch: pa.Table) -> pa.Table:
        k = batch.column("vec_id").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "jbkt": pa.array((k % num_buckets).astype(np.int64)),
                "node": pa.array(k, pa.int64()),
                "cluster": pa.array(np.full(len(k), -1, np.int64)),
                "kind": pa.array(np.zeros(len(k), np.int8)),  # 0=id scan
            }
        )

    def tag_role(ds: rd.Dataset, kind: int) -> rd.Dataset:
        def f(batch: pa.Table) -> pa.Table:
            k = batch.column("node").combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "jbkt": pa.array((k % num_buckets).astype(np.int64)),
                    "node": pa.array(k, pa.int64()),
                    "cluster": batch.column("cluster"),
                    "kind": pa.array(np.full(len(k), kind, np.int8)),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow")

    def assemble(group: pa.Table) -> pa.Table:
        n = group.column("node").combine_chunks().to_numpy(zero_copy_only=False)
        c = group.column("cluster").combine_chunks().to_numpy(zero_copy_only=False)
        kd = group.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((-kd, n))  # per node: core(2) > border(1) > scan(0)
        n, c, kd = n[order], c[order], kd[order]
        first = np.concatenate([[True], n[1:] != n[:-1]])
        role = np.array(["noise", "border", "core"], dtype=object)[kd[first]]
        return pa.table(
            {
                "vec_id": pa.array(n[first], pa.int64()),
                "role": pa.array(role, pa.string()),
                "cluster_id": pa.array(c[first], pa.int64()),
            }
        )

    return (
        ids.map_batches(tag_ids, batch_format="pyarrow")
        .union(tag_role(border, 1), tag_role(corec, 2))
        .groupby("jbkt")
        .map_groups(assemble, batch_format="pyarrow")
        .sort("vec_id")
    )


DEDUP_EVAL_MOD = 2


def dedup_eval_report(sf_dir: str, *, threshold: float = 0.8) -> pa.Table:
    """Offline DEDUP-QUALITY EVALUATION: pairwise precision/recall of the
    sketch-based near-dup paths (MinHash-LSH, SimHash) against the exact
    word-trigram Jaccard ground truth — the `ann_eval_report` counterpart
    for the dedup family, answering "how much daylight does LSH banding /
    Hamming thresholding leave vs the exact baseline".

    Metric: co-cluster pairs restricted to the deterministic
    ``doc_id % 2 == 0`` sample (truth = connected components over the
    EXACT Jaccard pairs computed only within the sample — O((N/2)²) work,
    ¼ of the full baseline, sized so the gate-scale sample still holds
    true pairs — near-dup pair density is low by construction;
    predictions = each method's full-corpus clusters restricted to sample
    endpoints, so a pair bridged through an out-of-sample doc honestly
    costs precision — the standard pairwise clustering metric).  Integer
    ppm (floor).  Returns (method, n_true_pairs, n_pred_pairs,
    precision_ppm, recall_ppm) sorted by method; gated via
    `dedup_eval_digest`, pinned from `oracle_dedup.dedup_eval_rows`.
    """
    truth_edges = [
        (int(r["a"]), int(r["b"]))
        for r in ngram_jaccard_pairs(
            sf_dir, threshold=threshold, id_mod=DEDUP_EVAL_MOD
        ).take_all()
    ]
    # CC over the exact pairs -> co-cluster pair set (cluster-size bounded)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in truth_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    tclust: dict[int, list[int]] = {}
    for v in parent:
        tclust.setdefault(find(v), []).append(v)
    true_pairs = {
        (x, y)
        for mem in tclust.values()
        for i, x in enumerate(sorted(mem))
        for y in sorted(mem)[i + 1 :]
    }

    def pred_pairs_of(cluster_ds) -> set:
        clust: dict[int, list[int]] = {}
        for r in cluster_ds.take_all():  # cluster rows only, corpus-sparse
            d = int(r["doc_id"])
            if d % DEDUP_EVAL_MOD == 0:
                clust.setdefault(int(r["cluster_id"]), []).append(d)
        return {
            (x, y)
            for mem in clust.values()
            for i, x in enumerate(sorted(mem))
            for y in sorted(mem)[i + 1 :]
        }

    methods = {
        "minhash_lsh": pred_pairs_of(minhash_lsh_dedup(sf_dir, threshold=threshold)),
        "simhash": pred_pairs_of(simhash_dedup(sf_dir)),
    }
    out = {k: [] for k in ("method", "n_true_pairs", "n_pred_pairs",
                           "precision_ppm", "recall_ppm")}
    for m in sorted(methods):
        pred = methods[m]
        inter = len(pred & true_pairs)
        out["method"].append(m)
        out["n_true_pairs"].append(len(true_pairs))
        out["n_pred_pairs"].append(len(pred))
        out["precision_ppm"].append(inter * 1_000_000 // len(pred) if pred else 0)
        out["recall_ppm"].append(
            inter * 1_000_000 // len(true_pairs) if true_pairs else 0
        )
    return pa.table(
        {
            "method": pa.array(out["method"], pa.string()),
            "n_true_pairs": pa.array(out["n_true_pairs"], pa.int64()),
            "n_pred_pairs": pa.array(out["n_pred_pairs"], pa.int64()),
            "precision_ppm": pa.array(out["precision_ppm"], pa.int64()),
            "recall_ppm": pa.array(out["recall_ppm"], pa.int64()),
        }
    )


def dedup_eval_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `dedup_eval_report`: (n_rows, digest)."""
    from .interpret import DIGEST_MOD, row_digest

    t = dedup_eval_report(sf_dir)
    dg = 0
    for i in range(t.num_rows):
        pay = "\x1f".join(
            str(t.column(c)[i].as_py())
            for c in ("n_true_pairs", "n_pred_pairs", "precision_ppm", "recall_ppm")
        )
        dg = (dg + row_digest(t.column("method")[i].as_py(), pay)) % DIGEST_MOD
    return pa.table(
        {
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


# --- content-defined chunking (gear CDC) ------------------------------------
CDC_MASK_BITS = 6  # expected chunk ≈ 64 bytes on random content
_CDC_WINDOW = 64


def _gear_table() -> np.ndarray:
    """Deterministic 256-entry gear table: 8 md5 bytes per byte value
    (the public gear-hash construction — no RNG, reproducible anywhere)."""
    import hashlib

    return np.array(
        [
            int.from_bytes(hashlib.md5(bytes([b])).digest()[:8], "big")
            for b in range(256)
        ],
        dtype=np.uint64,
    )


_GEAR = _gear_table()


def cdc_cut_points(data: bytes, *, mask_bits: int = CDC_MASK_BITS) -> np.ndarray:
    """Content-defined cut positions (exclusive ends) of ``data``: the
    rolling gear hash h_i = Σ_{k<64} gear[b_{i−k}] << k cuts wherever its
    low ``mask_bits`` bits are zero.  No min/max clamp, so every cut is a
    pure function of its trailing 64 bytes — boundaries survive
    insertions/deletions elsewhere (the CDC property), and the whole
    computation vectorizes as 64 shifted adds.  Always ends with
    ``len(data)``."""
    n = len(data)
    if n == 0:
        return np.empty(0, np.int64)
    b = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[b]
    h = np.zeros(n, dtype=np.uint64)
    for k in range(min(_CDC_WINDOW, n)):
        h[k:] += g[: n - k] << np.uint64(k)  # uint64 wrap == mod 2^64
    mask = np.uint64((1 << mask_bits) - 1)
    cuts = np.nonzero((h & mask) == 0)[0] + 1
    if not len(cuts) or cuts[-1] != n:
        cuts = np.concatenate([cuts, [n]])
    return cuts.astype(np.int64)


def cdc_dedup_stats(
    sf_dir: str, *, mask_bits: int = CDC_MASK_BITS, num_buckets: int = 64
) -> rd.Dataset:
    """Storage-layer dedup planning via content-defined chunking (gear
    hash — the FastCDC/LBFS family, public): split every document's
    UTF-8 bytes at content-defined boundaries, hash the chunks, and
    report per source how much of the byte volume is redundant at chunk
    granularity — the sub-document counterpart of `exact_dedup` (whole
    docs) and `paragraph_dedup` (structural units), robust to insertions
    because boundaries are functions of local content, not offsets.

    Per source: (n_chunks, n_distinct_chunks, bytes_total, bytes_unique,
    dedup_ratio_ppm = (total − unique)·10^6 // total), sorted by source.
    Exact: chunk identity is md5; distinct counting is ONE
    crc(hash)-bucket shuffle (a chunk's rows co-locate), sums are
    integers.  Digest-gated via `cdc_digest`, pinned from the
    independent sequential `oracle_dedup.cdc_rows` (the rolling hash is
    not SQL-expressible at reasonable cost).
    """
    import hashlib
    import zlib

    ds = sf_table(sf_dir, "documents", columns=["source", "text"])

    def chunk_rows(batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        out_b, out_s, out_h, out_l = [], [], [], []
        for sc, t in zip(srcs, texts):
            data = (t or "").encode("utf-8")
            prev = 0
            for cut in cdc_cut_points(data, mask_bits=mask_bits):
                chunk = data[prev:cut]
                prev = cut
                h = hashlib.md5(chunk).hexdigest()
                out_b.append(zlib.crc32(h.encode()) % num_buckets)
                out_s.append(sc)
                out_h.append(h)
                out_l.append(len(chunk))
        return pa.table(
            {
                "hbkt": pa.array(out_b, pa.int64()),
                "source": pa.array(out_s, pa.string()),
                "h": pa.array(out_h, pa.string()),
                "blen": pa.array(out_l, pa.int64()),
            }
        )

    def bucket_fold(group: pa.Table) -> pa.Table:
        """Exact per-source partials of this hash bucket: occurrences,
        per-source-distinct chunks and their byte volumes."""
        senc = pc.dictionary_encode(group.column("source").combine_chunks())
        henc = pc.dictionary_encode(group.column("h").combine_chunks())
        si = np.asarray(senc.indices, dtype=np.int64)
        hi = np.asarray(henc.indices, dtype=np.int64)
        blen = group.column("blen").combine_chunks().to_numpy(zero_copy_only=False)
        nh = max(len(henc.dictionary), 1)
        pair = si * nh + hi
        upair, first = np.unique(pair, return_index=True)
        ns = len(senc.dictionary)
        p_src = (upair // nh).astype(np.int64)
        n_occ = np.bincount(si, minlength=ns).astype(np.int64)
        b_tot = np.zeros(ns, np.int64)
        np.add.at(b_tot, si, blen)
        n_dis = np.bincount(p_src, minlength=ns).astype(np.int64)
        b_uni = np.zeros(ns, np.int64)
        np.add.at(b_uni, p_src, blen[first])
        return pa.table(
            {
                "source": senc.dictionary,
                "n_occ": pa.array(n_occ),
                "n_dis": pa.array(n_dis),
                "b_tot": pa.array(b_tot),
                "b_uni": pa.array(b_uni),
            }
        )

    rows = (
        ds.map_batches(chunk_rows, batch_format="pyarrow")
        .groupby("hbkt")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .take_all()
    )  # ≤ B × sources rows
    acc: dict[str, list[int]] = {}
    for r in rows:
        a = acc.setdefault(r["source"], [0, 0, 0, 0])
        a[0] += r["n_occ"]
        a[1] += r["n_dis"]
        a[2] += r["b_tot"]
        a[3] += r["b_uni"]
    srcs = sorted(acc)
    ratio = [
        (acc[s][2] - acc[s][3]) * 1_000_000 // acc[s][2] if acc[s][2] else 0
        for s in srcs
    ]
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "n_chunks": pa.array([acc[s][0] for s in srcs], pa.int64()),
                "n_distinct_chunks": pa.array([acc[s][1] for s in srcs], pa.int64()),
                "bytes_total": pa.array([acc[s][2] for s in srcs], pa.int64()),
                "bytes_unique": pa.array([acc[s][3] for s in srcs], pa.int64()),
                "dedup_ratio_ppm": pa.array(ratio, pa.int64()),
            }
        )
    )


def cdc_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `cdc_dedup_stats`: (n_rows, digest), pinned from
    the independent sequential `oracle_dedup.cdc_rows`."""
    from .interpret import DIGEST_MOD, row_digest

    rows = cdc_dedup_stats(sf_dir, **kwargs).take_all()
    dg = 0
    for r in rows:
        pay = "\x1f".join(
            str(r[c])
            for c in (
                "n_chunks",
                "n_distinct_chunks",
                "bytes_total",
                "bytes_unique",
                "dedup_ratio_ppm",
            )
        )
        dg = (dg + row_digest(r["source"], pay)) % DIGEST_MOD
    return pa.table(
        {
            "n_rows": pa.array([len(rows)], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )
