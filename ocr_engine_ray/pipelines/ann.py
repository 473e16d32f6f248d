"""Approximate-nearest-neighbor search over an embedding column.

- ``ann_topk_bruteforce``: the exact baseline — broadcast query matrix
  (``ray.put`` once, zero-copy ``ray.get`` per task), per-batch float64
  matmul, per-batch partial top-k, then one tiny groupby over partials for
  the global top-k.  The shuffle moves O(queries × k × blocks) rows, never
  the corpus.
- ``ann_topk_lsh``: a scale path — deterministic random-hyperplane LSH
  (8 planes → 256 buckets); each query probes only its bucket (plus
  Hamming-1 neighbors), trading recall for a corpus-partitioned search.
  Recall vs the brute-force baseline is asserted in tests.
- ``ann_topk_ivf``: the other scale path — IVF with a deterministic
  k-means coarse quantizer; queries probe their nprobe nearest inverted
  lists, vectors are scored only against the queries probing their list.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..sources.tables import sf_table


def _load_queries(
    sf_dir: str, num_queries: int, *, emb: rd.Dataset | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic query set: the embeddings with the smallest vec_ids,
    found via per-batch partial top-k — only ``num_queries × blocks`` rows
    ever reach the driver, never the table.  Returns (qids, normalized,
    raw); pass a (materialized) ``emb`` to reuse pinned blocks instead of
    re-reading the table.  Raw vectors ride along so IVF probe selection
    (raw-vector L2 geometry) needs no second fetch."""
    if emb is None:
        emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _k_smallest(batch: pa.Table) -> pa.Table:
        vid = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        idx = np.argsort(vid)[:num_queries]
        return batch.take(pa.array(idx, pa.int64()))

    rows = sorted(
        emb.map_batches(_k_smallest, batch_format="pyarrow").take_all(),
        key=lambda r: r["vec_id"],
    )[:num_queries]
    qids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    return qids, q / qn[:, None], q


def ann_topk_bruteforce(sf_dir: str, *, num_queries: int = 8, k: int = 5) -> pa.Table:
    """Exact cosine top-k per query.  Returns (query_id, rank, vec_id) with
    rank 1..k ordered by similarity desc, vec_id asc on ties; the query
    vector itself is excluded from its own result."""
    qids, qmat, _ = _load_queries(sf_dir, num_queries)
    ref = ray.put((qids, qmat))

    # Task-mode scorer: the broadcast query matrix travels as an ObjectRef in
    # fn_kwargs and is `ray.get`-read per batch (plasma, zero-copy — free
    # after the first touch per worker).  An actor pool here costs 2-6 s of
    # ramp for a sub-second stage (measured: 5.8 s actors vs 1.25 s tasks at
    # sf0.1); reserve actor pools for heavyweight model state.
    def score(batch: pa.Table, *, ref) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        bqids, bqmat = ray.get(ref)
        vid = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        sims = (m / n[:, None]) @ bqmat.T  # (batch × queries)
        sims[vid[:, None] == bqids[None, :]] = -np.inf  # exclude self
        topn = min(k, len(vid))
        # Partial top-k per query with the (score desc, vec_id asc)
        # TIE-BREAK: a bare argpartition keeps an arbitrary member of a
        # score tie straddling the cut, which breaks both the documented
        # contract and batching-invariance on duplicate vectors.  lexsort
        # is O(n log n) per query, and queries are few by design.
        qp, vp, sp = [], [], []
        for qi in range(len(bqids)):
            order = np.lexsort((vid, -sims[:, qi]))[:topn]
            s = sims[order, qi]
            keep = np.isfinite(s)  # drop the self row entirely
            qp.append(np.full(int(keep.sum()), bqids[qi], dtype=np.int64))
            vp.append(vid[order][keep])
            sp.append(s[keep])
        if not qp:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qp), pa.int64()),
                "vec_id": pa.array(np.concatenate(vp), pa.int64()),
                "score": pa.array(np.concatenate(sp), pa.float64()),
            }
        )

    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = emb.map_batches(
        score, batch_format="pyarrow", batch_size=1024, fn_kwargs={"ref": ref}
    )

    def _final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(
                group.column("score").to_pylist(),
                group.column("vec_id").to_pylist(),
            ),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
                "vec_id": pa.array([v for _, v in rows], pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(_final_topk, batch_format="pyarrow")


def embedding_kmeans(
    sf_dir: str, *, k: int = 8, iters: int = 5
) -> rd.Dataset:
    """Deterministic k-means over the embedding column (iterative algorithm
    showcase — cluster-balanced curation is a standard training-data step).

    Per iteration: centroids are broadcast (``ray.put``), each batch computes
    assignments and emits PARTIAL (sum, count) per cluster — so the shuffle
    moves ``k × blocks`` rows, never the corpus — and the driver folds the
    partials into new centroids.  Init = the k vectors with smallest vec_id,
    found via per-batch partial top-k (k rows per block reach the driver,
    never the table); everything is a pure function of the data (no RNG).
    Returns a (vec_id, cluster) Dataset sorted by vec_id — the assignment
    stays distributed.  No SQL oracle (iterative); convergence and
    determinism are pytest-verified.
    """
    # Materialize HERE (not just inside the centroid loop) so the final
    # assignment pass below also reads the pinned blocks instead of
    # re-executing the parquet read chain.
    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    centroids = _kmeans_centroids(emb, k=k, iters=iters)

    # final assignment (one more broadcast pass)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        _, a = _assign_batch(batch, cref)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "cluster": pa.array(a.astype(np.int32)),
            }
        )

    return emb.map_batches(assign, batch_format="pyarrow").sort("vec_id")


def _assign_batch(batch: pa.Table, cref) -> tuple[np.ndarray, np.ndarray]:
    c = ray.get(cref)
    if batch.num_rows == 0:  # empty block: 1-D empty m breaks the distance kernel
        return (
            np.empty((0, c.shape[1]), dtype=np.float64),
            np.empty(0, dtype=np.int64),
        )
    m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
    d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    return m, d.argmin(axis=1)


_KMEANS_Q = 1 << 40  # fixed-point quantum for exact centroid accumulation



def _smallest_rows(emb: rd.Dataset, n: int) -> list[dict]:
    """The n rows with the smallest vec_ids via per-batch partial top-n —
    only ``n x blocks`` rows reach the driver.  Shared by the k-means /
    PQ seed selection and the deterministic query set so callers fetch
    the prefix ONCE per pipeline instead of once per consumer."""

    def _k_smallest(batch: pa.Table) -> pa.Table:
        vid = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        idx = np.argsort(vid)[:n]
        return batch.take(pa.array(idx, pa.int64()))

    return sorted(
        emb.map_batches(_k_smallest, batch_format="pyarrow").take_all(),
        key=lambda r: r["vec_id"],
    )[:n]


def _kmeans_centroids(emb: rd.Dataset, *, k: int, iters: int, seed_rows: list[dict] | None = None) -> np.ndarray:
    """The deterministic broadcast/partial-aggregate k-means iteration; the
    driver folds only ``k × blocks`` partial (sum, count) rows per round.

    BIT-deterministic across batchings, arrival orders and cluster shapes:
    per-cluster sums accumulate as EXACT integers — each component is
    quantized once to ``round(x * 2^40)`` (that quantized grid IS the
    operator's definition; ~1e-12 relative, semantically irrelevant to
    clustering) — so the driver fold is commutative bignum addition and the
    centroid is the same IEEE double no matter how Ray splits the batches.
    int64 partials are safe to ~8e6 rows/cluster/batch; the driver folds in
    Python bignums, so no corpus size overflows.  This is what makes the
    downstream kmeans/semantic/IVF surfaces digest-gateable."""

    # Iterative algorithm: pin the (projected) input once so each of the
    # `iters` passes reads plasma blocks instead of re-executing the read
    # chain.  At 100-TB scale this is the standard iterate-on-cached-input
    # shape; the object store spills cold blocks as needed.  Callers that
    # scan the input again after this returns should pass a materialized
    # dataset so their pass reuses the same pinned blocks.
    from ray.data.dataset import MaterializedDataset

    if not isinstance(emb, MaterializedDataset):
        emb = emb.materialize()

    if seed_rows is None:
        seed_rows = _smallest_rows(emb, k)
    centroids = np.array(
        [r["embedding"] for r in seed_rows[:k]], dtype=np.float64
    )

    for _ in range(iters):
        cref = ray.put(centroids)

        def partials(batch: pa.Table) -> pa.Table:
            m, a = _assign_batch(batch, cref)
            mq = np.round(m * _KMEANS_Q).astype(np.int64)  # exact fixed-point
            sums, counts = [], []
            clusters = []
            for ci in range(k):
                mask = a == ci
                if mask.any():
                    clusters.append(ci)
                    sums.append(mq[mask].sum(axis=0).tolist())
                    counts.append(int(mask.sum()))
            return pa.table(
                {
                    "cluster": pa.array(clusters, pa.int32()),
                    "vec_sum": pa.array(sums, pa.list_(pa.int64())),
                    "n": pa.array(counts, pa.int64()),
                }
            )

        parts = emb.map_batches(partials, batch_format="pyarrow").take_all()
        dim = centroids.shape[1]
        sums = [[0] * dim for _ in range(k)]  # Python bignums: exact, order-free
        counts = [0] * k
        for r in parts:
            ci = r["cluster"]
            vs = r["vec_sum"]
            row = sums[ci]
            for j in range(dim):
                row[j] += vs[j]
            counts[ci] += r["n"]
        for ci in range(k):
            if counts[ci]:
                centroids[ci] = np.array(
                    [s / (counts[ci] * _KMEANS_Q) for s in sums[ci]], dtype=np.float64
                )

    return centroids


def _hyperplanes(dim: int, planes: int = 8) -> np.ndarray:
    rng = np.random.default_rng(1234)
    return rng.standard_normal((planes, dim))


def _bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (vecs @ planes.T) > 0
    return (signs.astype(np.uint32) << np.arange(planes.shape[0], dtype=np.uint32)).sum(axis=1)


def ann_topk_lsh(sf_dir: str, *, num_queries: int = 8, k: int = 5) -> pa.Table:
    """LSH-bucketed ANN: search only the query's hyperplane bucket (plus
    Hamming-1 probes).  Approximate — validated by recall tests."""
    qids, qmat, _ = _load_queries(sf_dir, num_queries)
    planes = _hyperplanes(qmat.shape[1])
    qbuckets = _bucket_of(qmat, planes)
    probe: dict[int, set[int]] = {}
    for qi, b in enumerate(qbuckets):
        bs = {int(b)} | {int(b) ^ (1 << p) for p in range(planes.shape[0])}
        for bb in bs:
            probe.setdefault(bb, set()).add(qi)
    ref = ray.put((qids, qmat, planes, probe))

    # Task-mode bucketed scorer (see ann_topk_bruteforce for the
    # actors-vs-tasks rationale).
    def bucket_score(batch: pa.Table, *, ref) -> pa.Table:
        if batch.num_rows == 0:  # empty block: 1-D empty m breaks norm/axis=1
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        bqids, bqmat, bplanes, bprobe = ray.get(ref)
        vid = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        mn = m / n[:, None]
        buckets = _bucket_of(mn, bplanes)
        # Group rows by bucket (one argsort), then one matmul + repeat/tile
        # triple per probed bucket — no per-candidate Python.
        chunks_q, chunks_v, chunks_s = [], [], []
        order = np.argsort(buckets, kind="stable")
        sb = buckets[order]
        cuts = np.nonzero(np.diff(sb))[0] + 1
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [len(sb)]]) if len(sb) else np.array([], dtype=int)
        for s0, e0 in zip(starts, ends):
            qidx = bprobe.get(int(sb[s0]), ())
            if not qidx:
                continue
            rows = order[s0:e0]
            qarr = np.fromiter(qidx, dtype=np.int64, count=len(qidx))
            sims = mn[rows] @ bqmat[qarr].T  # (rows × probing queries)
            v = np.repeat(vid[rows], len(qarr))
            q = np.tile(bqids[qarr], len(rows))
            keep = v != q  # exclude self
            chunks_q.append(q[keep])
            chunks_v.append(v[keep])
            chunks_s.append(sims.ravel()[keep])
        empty_i = np.array([], dtype=np.int64)
        empty_f = np.array([], dtype=np.float64)
        return pa.table(
            {
                "query_id": pa.array(
                    np.concatenate(chunks_q) if chunks_q else empty_i, pa.int64()
                ),
                "vec_id": pa.array(
                    np.concatenate(chunks_v) if chunks_v else empty_i, pa.int64()
                ),
                "score": pa.array(
                    np.concatenate(chunks_s) if chunks_s else empty_f, pa.float64()
                ),
            }
        )

    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = emb.map_batches(
        bucket_score, batch_format="pyarrow", batch_size=1024, fn_kwargs={"ref": ref}
    )

    def _final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("score").to_pylist(), group.column("vec_id").to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
                "vec_id": pa.array([v for _, v in rows], pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(_final_topk, batch_format="pyarrow")


def ann_topk_ivf(
    sf_dir: str,
    *,
    num_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
) -> rd.Dataset:
    """IVF-bucketed ANN: a deterministic k-means coarse quantizer partitions
    the corpus into inverted lists; each query scores only vectors whose
    list is among its ``nprobe`` nearest centroids.

    Scale shape: centroid training moves ``k × blocks`` partial rows per
    iteration (never the corpus); the search is ONE corpus scan in which a
    vector is scored against only the queries probing its list, and the
    final top-k groupby moves O(queries × k × blocks) partials.  Approximate
    — recall vs the brute-force baseline is asserted in tests (rows-only at
    the driver gate, like ann_topk_lsh).
    """
    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    centroids = _kmeans_centroids(emb, k=n_centroids, iters=iters)
    # Reuses the materialized emb (no extra table scan); raw vectors come
    # back alongside the normalized ones because probe selection must use
    # the same (raw-vector L2) geometry as corpus assignment.
    qids, qmat, qraw = _load_queries(sf_dir, num_queries, emb=emb)
    qd = ((qraw[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe_of_list: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in np.argpartition(qd[qi], min(nprobe, len(centroids)) - 1)[:nprobe]:
            probe_of_list.setdefault(int(c), []).append(qi)
    ref = ray.put((qids, qmat, centroids, probe_of_list))

    def ivf_score(batch: pa.Table, *, ref) -> pa.Table:
        if batch.num_rows == 0:  # empty block: 1-D empty m breaks the kernels
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        bqids, bqmat, cents, probes = ray.get(ref)
        vid = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lists = d.argmin(axis=1)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        mn = m / n[:, None]
        # One matmul + repeat/tile triple per probed inverted list — no
        # per-candidate Python.
        chunks_q, chunks_v, chunks_s = [], [], []
        for c in np.unique(lists):
            qidx = probes.get(int(c), ())
            if not qidx:
                continue
            rows = np.nonzero(lists == c)[0]
            qarr = np.asarray(qidx, dtype=np.int64)
            sims = mn[rows] @ bqmat[qarr].T  # (rows × probing queries)
            v = np.repeat(vid[rows], len(qarr))
            q = np.tile(bqids[qarr], len(rows))
            keep = v != q  # exclude self
            chunks_q.append(q[keep])
            chunks_v.append(v[keep])
            chunks_s.append(sims.ravel()[keep])
        empty_i = np.array([], dtype=np.int64)
        empty_f = np.array([], dtype=np.float64)
        return pa.table(
            {
                "query_id": pa.array(
                    np.concatenate(chunks_q) if chunks_q else empty_i, pa.int64()
                ),
                "vec_id": pa.array(
                    np.concatenate(chunks_v) if chunks_v else empty_i, pa.int64()
                ),
                "score": pa.array(
                    np.concatenate(chunks_s) if chunks_s else empty_f, pa.float64()
                ),
            }
        )

    partials = emb.map_batches(
        ivf_score, batch_format="pyarrow", batch_size=1024, fn_kwargs={"ref": ref}
    )

    def _final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("score").to_pylist(), group.column("vec_id").to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
                "vec_id": pa.array([v for _, v in rows], pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(_final_topk, batch_format="pyarrow")


def ann_lsh_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `ann_topk_lsh`: its (query_id, rank, vec_id) output
    is integer-only with deterministic (-score, vec_id) tie-breaks, and the
    measured adjacent-score gap (~8e-4 at sf0.01) is 12 orders of magnitude
    above BLAS summation noise — so the pinned literal (from the sequential
    `oracle_dedup.ann_lsh_topk` twin) is stable across batchings and runs."""
    from .interpret import fold_digest

    res = ann_topk_lsh(sf_dir, **kwargs)

    def payload(batch: pa.Table) -> pa.Table:
        ranks = batch.column("rank").to_pylist()
        vids = batch.column("vec_id").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("query_id"),
                "payload": pa.array(
                    [f"{r}:{v}" for r, v in zip(ranks, vids)], pa.string()
                ),
            }
        )

    ds = res if isinstance(res, rd.Dataset) else rd.from_arrow(res)
    return fold_digest(ds.map_batches(payload, batch_format="pyarrow"), "payload")


def _vec_cluster_digest(ds: rd.Dataset) -> pa.Table:
    from .interpret import fold_digest

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


def kmeans_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `embedding_kmeans`.  Pinnable because the quantized
    integer centroid fold (`_kmeans_centroids`) is bit-deterministic across
    batchings, and the min assignment-boundary gap at sf0.01 is ~9e-4 — 11
    orders above float noise.  Literal from `oracle_dedup.kmeans_assignments`."""
    return _vec_cluster_digest(embedding_kmeans(sf_dir, **kwargs))


def ann_ivf_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `ann_topk_ivf` (integer rows, deterministic
    tie-breaks; min probe-boundary gap ~1e-3 at sf0.01).  Literal from
    `oracle_dedup.ivf_topk`."""
    from .interpret import fold_digest

    res = ann_topk_ivf(sf_dir, **kwargs)

    def payload(batch: pa.Table) -> pa.Table:
        ranks = batch.column("rank").to_pylist()
        vids = batch.column("vec_id").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("query_id"),
                "payload": pa.array(
                    [f"{r}:{v}" for r, v in zip(ranks, vids)], pa.string()
                ),
            }
        )

    ds = res if isinstance(res, rd.Dataset) else rd.from_arrow(res)
    return fold_digest(ds.map_batches(payload, batch_format="pyarrow"), "payload")


# --- IVF-PQ (Jégou, Douze & Schmid, TPAMI 2011 — public classic) ------------

PQ_M = 32  # subspaces (dim 64 => 2-dim slices; chosen by measured recall:
#            0.725 @ m=32/ksub=32 vs 0.325 @ 8/16, against the 0.85 exact-
#            rerank ceiling of the nprobe=4/16 coarse quantizer at sf0.01)
PQ_KSUB = 32  # codes per subspace


def _pq_codebooks(
    emb: rd.Dataset,
    *,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 3,
    seed_rows: list[dict] | None = None,
) -> np.ndarray:
    """Product-quantizer codebooks over the NORMALIZED vectors: one
    deterministic k-means per subspace, all ``m`` trained in the same
    distributed passes (each batch emits partials keyed (sub, code), so one
    map_batches per iteration covers every subspace; the shuffle-free driver
    fold sees ``m x ksub x blocks`` tiny rows, never the corpus).

    BIT-deterministic by the `_kmeans_centroids` contract: per-(sub, code)
    sums accumulate components quantized once to ``round(x * 2^40)`` and the
    driver folds Python bignums, so codebooks are the same IEEE doubles for
    any batching.  Seeds: the normalized sub-vectors of the ``ksub``
    smallest vec_ids.  Returns (m, ksub, dim//m) float64.
    """
    from ray.data.dataset import MaterializedDataset

    if not isinstance(emb, MaterializedDataset):
        emb = emb.materialize()

    if seed_rows is None:
        seed_rows = _smallest_rows(emb, ksub)
    seed = np.array([r["embedding"] for r in seed_rows[:ksub]], dtype=np.float64)
    sn = np.linalg.norm(seed, axis=1)
    sn[sn == 0] = 1.0
    seed = seed / sn[:, None]
    dim = seed.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds_ = dim // m
    cbs = np.stack([seed[:, s * ds_ : (s + 1) * ds_].copy() for s in range(m)])

    for _ in range(iters):
        cref = ray.put(cbs)

        def partials(batch: pa.Table) -> pa.Table:
            cb = ray.get(cref)
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "sub": pa.array([], pa.int32()),
                        "code": pa.array([], pa.int32()),
                        "vec_sum": pa.array([], pa.list_(pa.int64())),
                        "n": pa.array([], pa.int64()),
                    }
                )
            mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            mn = mat / norms[:, None]
            mq = np.round(mn * _KMEANS_Q).astype(np.int64)  # exact fixed-point
            subs, codes_o, sums, ns = [], [], [], []
            for s in range(m):
                sub = mn[:, s * ds_ : (s + 1) * ds_]
                d = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                a = d.argmin(axis=1)
                sq = mq[:, s * ds_ : (s + 1) * ds_]
                for code in range(ksub):
                    mask = a == code
                    if mask.any():
                        subs.append(s)
                        codes_o.append(code)
                        sums.append(sq[mask].sum(axis=0).tolist())
                        ns.append(int(mask.sum()))
            return pa.table(
                {
                    "sub": pa.array(subs, pa.int32()),
                    "code": pa.array(codes_o, pa.int32()),
                    "vec_sum": pa.array(sums, pa.list_(pa.int64())),
                    "n": pa.array(ns, pa.int64()),
                }
            )

        parts = emb.map_batches(partials, batch_format="pyarrow").take_all()
        sums = [[[0] * ds_ for _ in range(ksub)] for _ in range(m)]  # bignums
        counts = [[0] * ksub for _ in range(m)]
        for r in parts:
            s, c = r["sub"], r["code"]
            row = sums[s][c]
            for j, v in enumerate(r["vec_sum"]):
                row[j] += v
            counts[s][c] += r["n"]
        for s in range(m):
            for c in range(ksub):
                if counts[s][c]:
                    cbs[s][c] = np.array(
                        [x / (counts[s][c] * _KMEANS_Q) for x in sums[s][c]],
                        dtype=np.float64,
                    )
    return cbs


def ann_topk_ivfpq(
    sf_dir: str,
    *,
    num_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    pq_iters: int = 3,
) -> rd.Dataset:
    """IVF-PQ ANN: the IVF coarse quantizer prunes the corpus to ``nprobe``
    inverted lists per query; within probed lists the inner product is
    APPROXIMATED by asymmetric distance computation (ADC) over ``m``-byte PQ
    codes — scores come from a per-query (m x ksub) lookup table, never the
    raw vectors.

    Scale shape: at 100 TB the corpus rides as ``m`` uint8 codes per vector
    (8x smaller than float32 at dim=64 with m=32; the m/ksub point trades
    recall vs compression per deployment), the LUTs are queries x m x ksub
    floats broadcast once, and the search is ONE corpus scan + the same
    O(queries x k x blocks) top-k groupby as IVF.  Here codes are computed
    on the fly in the scan (encode-and-search fused — the testdata corpus
    carries raw vectors); a persisted-codes variant is the same scan minus
    the encode.

    Approximate twice over (list pruning + PQ quantization); recall vs the
    brute-force baseline is asserted in tests.  Deterministic: codebooks are
    bit-deterministic (`_pq_codebooks`), each (query, vector) ADC score is a
    fixed-order sum of ``m`` LUT floats, ties rank by vec_id.
    """
    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    # ONE partial-top-n prefix fetch feeds the coarse seeds, the PQ seeds
    # and the query set (all are smallest-vec_id prefixes)
    prefix = _smallest_rows(emb, max(n_centroids, ksub, num_queries))
    coarse = _kmeans_centroids(emb, k=n_centroids, iters=iters, seed_rows=prefix)
    cbs = _pq_codebooks(emb, m=m, ksub=ksub, iters=pq_iters, seed_rows=prefix)
    ds_ = cbs.shape[2]
    qrows = prefix[:num_queries]
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qraw = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qraw, axis=1)
    qn[qn == 0] = 1.0
    qmat = qraw / qn[:, None]
    qd = ((qraw[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
    probe_of_list: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in np.argpartition(qd[qi], min(nprobe, len(coarse)) - 1)[:nprobe]:
            probe_of_list.setdefault(int(c), []).append(qi)
    # ADC lookup tables: LUT[q, s, c] = <q_sub_s, codeword_{s,c}>
    lut = np.stack(
        [qmat[:, s * ds_ : (s + 1) * ds_] @ cbs[s].T for s in range(m)], axis=1
    )
    ref = ray.put((qids, lut, coarse, cbs, probe_of_list))

    def pq_score(batch: pa.Table, *, ref) -> pa.Table:
        empty_i = np.array([], dtype=np.int64)
        empty_f = np.array([], dtype=np.float64)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array(empty_i, pa.int64()),
                    "vec_id": pa.array(empty_i, pa.int64()),
                    "score": pa.array(empty_f, pa.float64()),
                }
            )
        bqids, blut, cents, bcbs, probes = ray.get(ref)
        vid = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lists = d.argmin(axis=1)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mn = mat / norms[:, None]
        # PQ encode (per subspace argmin — same kernel as training)
        codes = np.empty((len(vid), m), dtype=np.int64)
        for s in range(m):
            sub = mn[:, s * ds_ : (s + 1) * ds_]
            codes[:, s] = (
                ((sub[:, None, :] - bcbs[s][None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
            )
        chunks_q, chunks_v, chunks_s = [], [], []
        for c in np.unique(lists):
            qidx = probes.get(int(c), ())
            if not qidx:
                continue
            rows = np.nonzero(lists == c)[0]
            qarr = np.asarray(qidx, dtype=np.int64)
            t = blut[qarr]  # (Q, m, ksub)
            cr = codes[rows]  # (R, m)
            acc = np.zeros((len(rows), len(qarr)), dtype=np.float64)
            for s in range(m):  # fixed subspace order => deterministic sums
                acc += t[:, s, :][:, cr[:, s]].T
            v = np.repeat(vid[rows], len(qarr))
            q = np.tile(bqids[qarr], len(rows))
            keep = v != q
            chunks_q.append(q[keep])
            chunks_v.append(v[keep])
            chunks_s.append(acc.ravel()[keep])
        return pa.table(
            {
                "query_id": pa.array(
                    np.concatenate(chunks_q) if chunks_q else empty_i, pa.int64()
                ),
                "vec_id": pa.array(
                    np.concatenate(chunks_v) if chunks_v else empty_i, pa.int64()
                ),
                "score": pa.array(
                    np.concatenate(chunks_s) if chunks_s else empty_f, pa.float64()
                ),
            }
        )

    partials = emb.map_batches(
        pq_score, batch_format="pyarrow", batch_size=1024, fn_kwargs={"ref": ref}
    )

    def _final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("score").to_pylist(), group.column("vec_id").to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
                "vec_id": pa.array([v for _, v in rows], pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(_final_topk, batch_format="pyarrow")


def ann_ivfpq_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `ann_topk_ivfpq` (integer rows; margins measured at
    sf0.01 — see the pinned literal's provenance note in oracle_sql()).
    Literal from `oracle_dedup.ivfpq_topk`."""
    from .interpret import fold_digest

    res = ann_topk_ivfpq(sf_dir, **kwargs)

    def payload(batch: pa.Table) -> pa.Table:
        ranks = batch.column("rank").to_pylist()
        vids = batch.column("vec_id").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("query_id"),
                "payload": pa.array(
                    [f"{r}:{v}" for r, v in zip(ranks, vids)], pa.string()
                ),
            }
        )

    ds = res if isinstance(res, rd.Dataset) else rd.from_arrow(res)
    return fold_digest(ds.map_batches(payload, batch_format="pyarrow"), "payload")


def pq_encode(
    sf_dir: str,
    *,
    n_centroids: int = 16,
    iters: int = 3,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    pq_iters: int = 3,
) -> tuple[rd.Dataset, np.ndarray, np.ndarray]:
    """Encode the corpus once into its at-scale ANN layout: a codes table
    (vec_id, list_id, codes uint8[m]) plus the small model (coarse
    centroids, PQ codebooks).  At 100 TB this is the persisted artifact —
    vectors are encoded once and every subsequent query set searches the
    8x-smaller codes table (`ann_search_codes`) without touching the raw
    embeddings.  Returns (codes_dataset, coarse, codebooks)."""
    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    prefix = _smallest_rows(emb, max(n_centroids, ksub))
    coarse = _kmeans_centroids(emb, k=n_centroids, iters=iters, seed_rows=prefix)
    cbs = _pq_codebooks(emb, m=m, ksub=ksub, iters=pq_iters, seed_rows=prefix)
    ds_ = cbs.shape[2]
    ref = ray.put((coarse, cbs))

    def encode(batch: pa.Table, *, ref) -> pa.Table:
        cents, bcbs = ray.get(ref)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "list_id": pa.array([], pa.int32()),
                    "codes": pa.array([], pa.list_(pa.uint8())),
                }
            )
        vid = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lists = d.argmin(axis=1).astype(np.int32)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mn = mat / norms[:, None]
        codes = np.empty((len(vid), len(bcbs)), dtype=np.uint8)
        for s in range(len(bcbs)):
            sub = mn[:, s * ds_ : (s + 1) * ds_]
            codes[:, s] = (
                ((sub[:, None, :] - bcbs[s][None, :, :]) ** 2)
                .sum(axis=2)
                .argmin(axis=1)
                .astype(np.uint8)
            )
        return pa.table(
            {
                "vec_id": pa.array(vid, pa.int64()),
                "list_id": pa.array(lists, pa.int32()),
                "codes": pa.array(list(codes), pa.list_(pa.uint8())),
            }
        )

    codes_ds = emb.map_batches(
        encode, batch_format="pyarrow", batch_size=1024, fn_kwargs={"ref": ref}
    )
    return codes_ds, coarse, cbs


def ann_search_codes(
    codes_ds: rd.Dataset,
    coarse: np.ndarray,
    cbs: np.ndarray,
    qids: np.ndarray,
    qraw: np.ndarray,
    *,
    k: int = 5,
    nprobe: int = 4,
) -> rd.Dataset:
    """ADC top-k over a persisted codes table — the query-time half of the
    decoupled IVF-PQ layout: the corpus scan touches ONLY (vec_id, list_id,
    codes); raw vectors never move.  Scores are the same fixed-order LUT
    sums as `ann_topk_ivfpq` (the fused variant), so both give identical
    results for the same model — pinned by the equality test."""
    m = cbs.shape[0]
    ds_ = cbs.shape[2]
    qn = np.linalg.norm(qraw, axis=1)
    qn[qn == 0] = 1.0
    qmat = qraw / qn[:, None]
    qd = ((qraw[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
    probe_of_list: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in np.argpartition(qd[qi], min(nprobe, len(coarse)) - 1)[:nprobe]:
            probe_of_list.setdefault(int(c), []).append(qi)
    lut = np.stack(
        [qmat[:, s * ds_ : (s + 1) * ds_] @ cbs[s].T for s in range(m)], axis=1
    )
    ref = ray.put((qids, lut, probe_of_list))

    def score_codes(batch: pa.Table, *, ref) -> pa.Table:
        empty_i = np.array([], dtype=np.int64)
        empty_f = np.array([], dtype=np.float64)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array(empty_i, pa.int64()),
                    "vec_id": pa.array(empty_i, pa.int64()),
                    "score": pa.array(empty_f, pa.float64()),
                }
            )
        bqids, blut, probes = ray.get(ref)
        vid = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        lists = np.array(batch.column("list_id").to_pylist(), dtype=np.int64)
        codes = np.array(batch.column("codes").to_pylist(), dtype=np.int64)
        chunks_q, chunks_v, chunks_s = [], [], []
        for c in np.unique(lists):
            qidx = probes.get(int(c), ())
            if not qidx:
                continue
            rows = np.nonzero(lists == c)[0]
            qarr = np.asarray(qidx, dtype=np.int64)
            t = blut[qarr]
            cr = codes[rows]
            acc = np.zeros((len(rows), len(qarr)), dtype=np.float64)
            for s in range(t.shape[1]):  # fixed subspace order
                acc += t[:, s, :][:, cr[:, s]].T
            v = np.repeat(vid[rows], len(qarr))
            q = np.tile(bqids[qarr], len(rows))
            keep = v != q
            chunks_q.append(q[keep])
            chunks_v.append(v[keep])
            chunks_s.append(acc.ravel()[keep])
        return pa.table(
            {
                "query_id": pa.array(
                    np.concatenate(chunks_q) if chunks_q else empty_i, pa.int64()
                ),
                "vec_id": pa.array(
                    np.concatenate(chunks_v) if chunks_v else empty_i, pa.int64()
                ),
                "score": pa.array(
                    np.concatenate(chunks_s) if chunks_s else empty_f, pa.float64()
                ),
            }
        )

    partials = codes_ds.map_batches(
        score_codes, batch_format="pyarrow", batch_size=4096, fn_kwargs={"ref": ref}
    )

    def _final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("score").to_pylist(), group.column("vec_id").to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
                "vec_id": pa.array([v for _, v in rows], pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(_final_topk, batch_format="pyarrow")


def hard_negatives(sf_dir: str, *, num_queries: int = 8, k: int = 5) -> pa.Table:
    """Exact hard-negative mining for contrastive training: for each query
    vector, the cosine top-k among vectors with a DIFFERENT label (the
    near-but-wrong examples embedding-model training wants).  Returns
    (query_id, rank, vec_id), rank 1..k by similarity desc, vec_id asc ties.

    Same scale shape as `ann_topk_bruteforce` — the query matrix (plus its
    label vector) is broadcast once via ``ray.put``, each corpus batch does
    one float64 matmul and a label-mask, partial top-k per batch, one tiny
    groupby finishes.  The corpus never shuffles.  Null-label rows are
    excluded, matching the SQL twin's ``e.label <> q.label``.
    """
    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def _k_smallest(batch: pa.Table) -> pa.Table:
        vid = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        idx = np.argsort(vid)[:num_queries]
        return batch.take(pa.array(idx, pa.int64()))

    rows = sorted(
        emb.map_batches(_k_smallest, batch_format="pyarrow").take_all(),
        key=lambda r: r["vec_id"],
    )[:num_queries]
    qids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    qlab = np.array(
        [-1 if r["label"] is None else r["label"] for r in rows], dtype=np.int64
    )
    qlab_null = np.array([r["label"] is None for r in rows], dtype=bool)
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    ref = ray.put((qids, qlab, qlab_null, q / qn[:, None]))

    def score(batch: pa.Table, *, ref) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        bqids, bqlab, bqnull, bqmat = ray.get(ref)
        vid = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        lab_py = batch.column("label").to_pylist()
        lab = np.array([-1 if v is None else v for v in lab_py], dtype=np.int64)
        lab_null = np.array([v is None for v in lab_py], dtype=bool)
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        sims = (m / n[:, None]) @ bqmat.T  # (batch × queries)
        # SQL `e.label <> q.label` is FALSE-or-NULL when either side is NULL
        # or the labels match — exclude all of those rows
        same = (lab[:, None] == bqlab[None, :]) & ~lab_null[:, None] & ~bqnull[None, :]
        drop = same | lab_null[:, None] | bqnull[None, :]
        drop |= vid[:, None] == bqids[None, :]  # self, for null-label queries
        sims[drop] = -np.inf
        topn = min(k, len(vid))
        qp, vp, sp = [], [], []
        for qi in range(len(bqids)):
            order = np.lexsort((vid, -sims[:, qi]))[:topn]
            s = sims[order, qi]
            keep = np.isfinite(s)
            qp.append(np.full(int(keep.sum()), bqids[qi], dtype=np.int64))
            vp.append(vid[order][keep])
            sp.append(s[keep])
        if not qp:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qp), pa.int64()),
                "vec_id": pa.array(np.concatenate(vp), pa.int64()),
                "score": pa.array(np.concatenate(sp), pa.float64()),
            }
        )

    partials = emb.map_batches(
        score, batch_format="pyarrow", batch_size=1024, fn_kwargs={"ref": ref}
    )

    def _final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(
                group.column("score").to_pylist(),
                group.column("vec_id").to_pylist(),
            ),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
                "vec_id": pa.array([v for _, v in rows], pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(_final_topk, batch_format="pyarrow")


def rrf_fused_topk(
    sf_dir: str, *, num_queries: int = 8, k: int = 5, kconst: int = 60
) -> pa.Table:
    """Reciprocal-rank fusion of two exact rankings — cosine similarity and
    L2 distance — per query: the hybrid-retrieval merge (Cormack et al.'s
    RRF, the standard way to fuse lexical+vector or multi-metric result
    lists).  Each metric contributes ``1/(kconst + rank)`` for its top-k;
    vectors absent from a list contribute 0; fused order is (score desc,
    vec_id asc).

    ONE corpus pass computes BOTH metrics against the broadcast query
    matrix (raw for L2, normalized for cosine) and emits per-batch partial
    top-k rows PER METRIC; a single (query, metric) groupby finalizes each
    ranking, and the fuse is a queries×2k-row group fold.  The corpus
    never shuffles and is read once.

    Returns (query_id, rank, vec_id); twin joins the two window rankings
    in SQL (the double ``1/(kconst+r)`` terms are bit-identical on both
    sides — integer ranks, one sum of two doubles).
    """
    qids, qmat, qraw = _load_queries(sf_dir, num_queries)
    ref = ray.put((qids, qmat, qraw))

    def score(batch: pa.Table, *, ref) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "metric": pa.array([], pa.int32()),
                "vec_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        bqids, bqmat, bqraw = ray.get(ref)
        vid = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        cos = (m / n[:, None]) @ bqmat.T                      # higher = better
        d2 = ((m[:, None, :] - bqraw[None, :, :]) ** 2).sum(axis=2)
        self_mask = vid[:, None] == bqids[None, :]
        cos[self_mask] = -np.inf
        l2 = -np.sqrt(d2)                                     # negate: higher = better
        l2[self_mask] = -np.inf
        topn = min(k, len(vid))
        qp, mp, vp, sp = [], [], [], []
        for qi in range(len(bqids)):
            for metric, s in ((0, cos[:, qi]), (1, l2[:, qi])):
                order = np.lexsort((vid, -s))[:topn]
                sv = s[order]
                keep = np.isfinite(sv)
                qp.append(np.full(int(keep.sum()), bqids[qi], dtype=np.int64))
                mp.append(np.full(int(keep.sum()), metric, dtype=np.int32))
                vp.append(vid[order][keep])
                sp.append(sv[keep])
        if not qp:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qp), pa.int64()),
                "metric": pa.array(np.concatenate(mp), pa.int32()),
                "vec_id": pa.array(np.concatenate(vp), pa.int64()),
                "score": pa.array(np.concatenate(sp), pa.float64()),
            }
        )

    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = emb.map_batches(
        score, batch_format="pyarrow", batch_size=1024, fn_kwargs={"ref": ref}
    )

    def fuse(group: pa.Table) -> pa.Table:
        met = group.column("metric").to_pylist()
        vids = group.column("vec_id").to_pylist()
        scs = group.column("score").to_pylist()
        qid = group.column("query_id")[0].as_py()
        rrf: dict[int, float] = {}
        for metric in (0, 1):
            rows = sorted(
                ((s, v) for mt, v, s in zip(met, vids, scs) if mt == metric),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            for r, (_, v) in enumerate(rows, start=1):
                rrf[v] = rrf.get(v, 0.0) + 1.0 / (kconst + r)
        out = sorted(rrf.items(), key=lambda t: (-t[1], t[0]))[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(out), pa.int64()),
                "rank": pa.array(range(1, len(out) + 1), pa.int64()),
                "vec_id": pa.array([v for v, _ in out], pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(fuse, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SQ8 scalar-quantized search (the classic 8-bit codec next to IVF-PQ)
# ---------------------------------------------------------------------------

_SQ8_GRID = 1048576.0  # 2^20 — the shared embedding fixed-point quantum


def sq8_topk(sf_dir: str, *, num_queries: int = 8, k: int = 5) -> pa.Table:
    """Scalar-quantized (SQ8) top-k search: the corpus rides as one uint8
    code per dimension (min/max-trained affine codec, the
    faiss-``SQ8``/Milvus default memory-reduction codec), queries stay
    float, and scoring is asymmetric distance computation against the
    DECODED codes.  Every decoded value and query component is quantized
    to the shared 2^20 fixed-point grid, so each score is an exact int64
    dot product — (score_q DESC, vec_id) is a total order and the DuckDB
    wholesale-recompute twin matches bit-for-bit.

    Scale shape: one corpus pass for the per-dim min/max (d-sized
    partials per batch, driver folds batches×2 small vectors); one
    corpus pass for encode+ADC with the query matrix broadcast via
    ``ray.put`` and per-batch partial top-k — the corpus never shuffles,
    and at production scale only the uint8 codes (d bytes/vector) would
    persist.

    Returns (query_id, rank, vec_id, score_q), rank 1..k per query by
    (score_q DESC, vec_id), self excluded.
    """
    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def minmax(batch: pa.Table) -> pa.Table:
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        if not len(m):
            return pa.table({"mn": pa.array([], pa.list_(pa.float64())),
                             "mx": pa.array([], pa.list_(pa.float64()))})
        return pa.table(
            {
                "mn": pa.array([m.min(axis=0).tolist()], pa.list_(pa.float64())),
                "mx": pa.array([m.max(axis=0).tolist()], pa.list_(pa.float64())),
            }
        )

    parts = emb.map_batches(minmax, batch_format="pyarrow").take_all()
    mn = np.min([r["mn"] for r in parts], axis=0)
    mx = np.max([r["mx"] for r in parts], axis=0)

    qids, _, qraw = _load_queries(sf_dir, num_queries)
    qq = np.round(qraw * _SQ8_GRID).astype(np.int64)
    ref = ray.put((qids, qq, mn, mx))

    def score(batch: pa.Table, *, ref) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "score_q": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        bqids, bqq, bmn, bmx = ray.get(ref)
        vid = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        x = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        denom = np.where(bmx > bmn, bmx - bmn, 1.0)
        codes = np.clip(np.round((x - bmn) * 255.0 / denom), 0.0, 255.0)
        codes = np.where(bmx > bmn, codes, 0.0)
        decoded = bmn + codes * ((bmx - bmn) / 255.0)
        dq = np.round(decoded * _SQ8_GRID)
        # float64 GEMM over int-valued operands — exact (|terms| << 2^53)
        scores = dq @ bqq.T.astype(np.float64)
        scores[vid[:, None] == bqids[None, :]] = -np.inf
        topn = min(k, len(vid))
        qp, vp, sp = [], [], []
        for qi in range(len(bqids)):
            order = np.lexsort((vid, -scores[:, qi]))[:topn]
            s = scores[order, qi]
            keep = np.isfinite(s)
            qp.append(np.full(int(keep.sum()), bqids[qi], dtype=np.int64))
            vp.append(vid[order][keep])
            sp.append(s[keep].astype(np.int64))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qp), pa.int64()),
                "vec_id": pa.array(np.concatenate(vp), pa.int64()),
                "score_q": pa.array(np.concatenate(sp), pa.int64()),
            }
        )

    partials = emb.map_batches(
        score, batch_format="pyarrow", batch_size=1024, fn_kwargs={"ref": ref}
    )

    def _final(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(
                group.column("score_q").to_pylist(),
                group.column("vec_id").to_pylist(),
            ),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
                "vec_id": pa.array([v for _, v in rows], pa.int64()),
                "score_q": pa.array([s for s, _ in rows], pa.int64()),
            }
        )

    res = (
        partials.groupby("query_id")
        .map_groups(_final, batch_format="pyarrow")
        .sort(["query_id", "rank"])
        .take_all()
    )
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in res], pa.int64()),
            "rank": pa.array([r["rank"] for r in res], pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in res], pa.int64()),
            "score_q": pa.array([r["score_q"] for r in res], pa.int64()),
        }
    )


# --- MMR diverse selection ---------------------------------------------------
MMR_LAMBDA = 0.7
MMR_K = 10
MMR_CANDIDATES = 64


def mmr_diverse_topk(
    sf_dir: str,
    *,
    k: int = MMR_K,
    num_candidates: int = MMR_CANDIDATES,
    lam: float = MMR_LAMBDA,
) -> pa.Table:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein 1998) —
    the retrieval / data-curation diversifier: greedily pick the doc
    maximizing ``λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`` so the selected
    set covers the neighborhood of the query instead of k near-copies.

    Scale shape: relevance is ONE streaming cosine pass against the
    broadcast query (the `ann_topk_bruteforce` scorer shape, carrying the
    vector); per-batch partial top-``num_candidates`` bounds what leaves
    each task, one tiny fold yields the global candidate set; the
    inherently sequential greedy runs on the driver over those
    ``num_candidates`` rows only (64 × dim floats — constant at any
    corpus size).  Ties break (score desc, vec_id asc) everywhere.

    Returns (rank, vec_id) ints, rank 1..k — pinned from the sequential
    numpy oracle (`oracle_dedup.mmr_select`); the query vector (smallest
    vec_id) is excluded from its own result.
    """
    qids, qmat, _ = _load_queries(sf_dir, 1)
    qid, q = int(qids[0]), qmat[0]
    ref = ray.put(q)

    def score(batch: pa.Table, *, ref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "rel": pa.array([], pa.float64()),
                    "emb": pa.array([], pa.list_(pa.float64())),
                }
            )
        qv = ray.get(ref)
        vid = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        mn = m / n[:, None]
        rel = mn @ qv
        rel[vid == qid] = -np.inf  # exclude the query itself
        order = np.lexsort((vid, -rel))[: min(num_candidates, len(vid))]
        keep = np.isfinite(rel[order])
        order = order[keep]
        return pa.table(
            {
                "g": pa.array(np.zeros(len(order), dtype=np.int64)),
                "vec_id": pa.array(vid[order], pa.int64()),
                "rel": pa.array(rel[order], pa.float64()),
                "emb": pa.array(
                    [mn[i].tolist() for i in order], pa.list_(pa.float64())
                ),
            }
        )

    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cand = (
        emb.map_batches(score, batch_format="pyarrow", batch_size=1024,
                        fn_kwargs={"ref": ref})
        .groupby("g")
        .map_groups(
            lambda gr: gr.take(
                pa.array(
                    np.lexsort(
                        (
                            np.asarray(gr.column("vec_id").to_pylist()),
                            -np.asarray(gr.column("rel").to_pylist()),
                        )
                    )[:num_candidates],
                    pa.int64(),
                )
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )  # <= num_candidates rows on the driver, by construction
    vid = np.array([r["vec_id"] for r in cand], dtype=np.int64)
    rel = np.array([r["rel"] for r in cand], dtype=np.float64)
    mn = np.array([r["emb"] for r in cand], dtype=np.float64)
    picked = greedy_mmr(vid, rel, mn, k=k, lam=lam)
    return pa.table(
        {
            "rank": pa.array(range(1, len(picked) + 1), pa.int64()),
            "vec_id": pa.array(picked, pa.int64()),
        }
    )


def greedy_mmr(
    vid: "np.ndarray", rel: "np.ndarray", mn: "np.ndarray", *, k: int, lam: float
) -> list[int]:
    """The sequential MMR core over the (small) candidate set: normalized
    rows ``mn``, relevance ``rel``; ties (score desc, vec_id asc)."""
    sims = mn @ mn.T
    selected: list[int] = []
    chosen = np.zeros(len(vid), dtype=bool)
    maxsim = np.full(len(vid), -np.inf)
    for _ in range(min(k, len(vid))):
        mmr = lam * rel - (1.0 - lam) * np.where(
            np.isfinite(maxsim), maxsim, 0.0
        )
        if not selected:
            mmr = lam * rel  # first pick: pure relevance
        mmr = np.where(chosen, -np.inf, mmr)
        order = np.lexsort((vid, -mmr))
        i = int(order[0])
        selected.append(int(vid[i]))
        chosen[i] = True
        maxsim = np.maximum(maxsim, sims[:, i])
    return selected


KC_GRID = 1 << 20  # component quantization for exact-integer distances
KC_K = 8
KC_SHARDS = 8


@ray.remote
class _KCenterShard:
    """One shard of the greedy k-center state: owns (vec_id, qvec, dmin)
    for ids hashing here.  Vectors load once; each round moves one center
    vector down and one (max dmin, argmax id) partial up — O(D + 1) per
    shard per round, never the points."""

    def __init__(self) -> None:
        self._ids: list[np.ndarray] = []
        self._vecs: list[np.ndarray] = []
        self.ids = np.array([], dtype=np.int64)
        self.q = np.zeros((0, 0), dtype=np.int64)
        self.dmin = np.array([], dtype=np.int64)

    def load(self, ids: np.ndarray, q: np.ndarray) -> None:
        self._ids.append(ids)
        self._vecs.append(q)

    def seal(self) -> int:
        if self._ids:
            ids = np.concatenate(self._ids)
            q = np.concatenate(self._vecs, axis=0)
            order = np.argsort(ids)
            self.ids, self.q = ids[order], q[order]
            self._ids, self._vecs = [], []
        self.dmin = np.full(len(self.ids), np.iinfo(np.int64).max, dtype=np.int64)
        return len(self.ids)

    def min_id_row(self) -> tuple[int, np.ndarray] | None:
        """Seed partial: (smallest vec_id, its qvec)."""
        if not len(self.ids):
            return None
        return int(self.ids[0]), self.q[0]

    def update_and_peak(self, center_q: np.ndarray) -> tuple[int, int] | None:
        """Fold the new center into dmin, return this shard's
        (max dmin, smallest id attaining it)."""
        if not len(self.ids):
            return None
        diff = self.q - center_q[None, :]
        d = np.einsum("ij,ij->i", diff, diff)  # exact int64 on the grid
        np.minimum(self.dmin, d, out=self.dmin)
        mx = int(self.dmin.max())
        cand = self.ids[self.dmin == mx]
        return mx, int(cand.min())

    def vec_of(self, vid: int) -> np.ndarray:
        i = int(np.searchsorted(self.ids, vid))
        return self.q[i]


def kcenter_coreset(
    sf_dir: str, *, k: int = KC_K, num_shards: int = KC_SHARDS
) -> pa.Table:
    """Greedy k-CENTER coreset selection (Gonzalez 1985) over the
    embedding table — the classic geometric data-selection baseline
    ("pick the k most mutually-distant examples"), the deterministic
    counterpart of random coreset sampling and the seeding rule behind
    k-center clustering bounds.

    Distances are EXACT integers: each component quantizes once to
    ``round(x · 2^20)`` (the k-means q-grid convention) and the squared
    Euclidean distance is an int64 sum — every comparison and tie-break
    ((dmin desc, vec_id asc); seed = smallest vec_id) is integer-exact,
    which is what makes the selection digest-gateable.

    Scale shape: vectors partition once into state actors (the
    LPA/HyperBall shard pattern); each of the k rounds moves ONE center
    vector down and one (max, argmax-id) partial up per shard — no
    dataset rewrite, no driver-side points.  Returns
    (step, center_id, radius_q) where radius_q is the chosen point's
    distance to the previous centers (step 0: 0), i.e. the shrinking
    k-center covering radius.  Pinned from `oracle_dedup.kcenter_rows`.
    """
    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    shards = [_KCenterShard.remote() for _ in range(num_shards)]

    def push(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        q = np.round(mat * KC_GRID).astype(np.int64)
        owner = ids % num_shards
        refs = [
            shards[s].load.remote(ids[owner == s], q[owner == s])
            for s in range(num_shards)
            if (owner == s).any()
        ]
        ray.get(refs)
        return pa.table({"n": pa.array([len(ids)], pa.int64())})

    emb.map_batches(push, batch_format="pyarrow").sum("n")
    n_total = sum(ray.get([s.seal.remote() for s in shards]))
    empty = pa.table(
        {
            "step": pa.array([], pa.int64()),
            "center_id": pa.array([], pa.int64()),
            "radius_q": pa.array([], pa.int64()),
        }
    )
    if n_total == 0:
        for s in shards:
            ray.kill(s)
        return empty
    seeds = [r for r in ray.get([s.min_id_row.remote() for s in shards]) if r]
    seed_id, seed_q = min(seeds, key=lambda r: r[0])
    steps, ids_out, radii = [0], [seed_id], [0]
    center_q = seed_q
    for step in range(1, min(k, n_total)):
        peaks = [
            p
            for p in ray.get([s.update_and_peak.remote(center_q) for s in shards])
            if p
        ]
        mx = max(p[0] for p in peaks)
        nxt = min(p[1] for p in peaks if p[0] == mx)
        owner = shards[nxt % num_shards]
        center_q = ray.get(owner.vec_of.remote(nxt))
        steps.append(step)
        ids_out.append(nxt)
        radii.append(mx)
    for s in shards:
        ray.kill(s)
    return pa.table(
        {
            "step": pa.array(steps, pa.int64()),
            "center_id": pa.array(ids_out, pa.int64()),
            "radius_q": pa.array(radii, pa.int64()),
        }
    )


def kcenter_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `kcenter_coreset`: (n_centers, digest)."""
    from .interpret import DIGEST_MOD, row_digest

    t = kcenter_coreset(sf_dir)
    dg = 0
    for s, c, r in zip(
        t.column("step").to_pylist(),
        t.column("center_id").to_pylist(),
        t.column("radius_q").to_pylist(),
    ):
        dg = (dg + row_digest(str(s), f"{c}\x1f{r}")) % DIGEST_MOD
    return pa.table(
        {
            "n_centers": pa.array([t.num_rows], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


ANN_EVAL_Q40 = float(1 << 40)


def _eval_rows_from_lists(truth_rows, method_lists, *, k: int) -> list[tuple]:
    """Shared EVAL MATH spec (reimplemented by the sequential oracle):
    per query recall@k = hits·10⁶ // k and binary-relevance NDCG@k on the
    q40 grid, summed exactly over queries.  truth_rows / each method's
    rows are (query_id, rank, vec_id) triples."""
    import numpy as np

    truth: dict[int, set[int]] = {}
    for q, _, v in truth_rows:
        truth.setdefault(int(q), set()).add(int(v))
    idcg_cache: dict[int, float] = {}
    out = []
    for method in sorted(method_lists):
        ranked: dict[int, list[tuple[int, int]]] = {}
        for q, r, v in method_lists[method]:
            ranked.setdefault(int(q), []).append((int(r), int(v)))
        n_q = 0
        sum_recall = 0
        sum_ndcg_q = 0
        for q in sorted(truth):
            tset = truth[q]
            if not tset:
                continue
            n_q += 1
            lst = sorted(ranked.get(q, []))
            hits = sum(1 for _, v in lst if v in tset)
            sum_recall += hits * 1_000_000 // k
            ideal = min(k, len(tset))
            if ideal not in idcg_cache:
                idcg_cache[ideal] = float(
                    sum(1.0 / np.log2(r + 1) for r in range(1, ideal + 1))
                )
            dcg = float(
                sum(1.0 / np.log2(r + 1) for r, v in lst if v in tset)
            )
            sum_ndcg_q += int(np.round(dcg / idcg_cache[ideal] * ANN_EVAL_Q40))
        out.append(
            (method, n_q, sum_recall // n_q if n_q else 0, sum_ndcg_q)
        )
    return out


def ann_eval_report(sf_dir: str, *, num_queries: int = 8, k: int = 5) -> pa.Table:
    """Offline SEARCH-QUALITY EVALUATION of the approximate ANN paths
    against the exact brute-force ground truth — the recall@k / NDCG@k
    report every vector-search deployment tracks before trading accuracy
    for speed.  Methods evaluated: the LSH-bucketed and IVF paths (both
    already independently digest-gated, so this operator verifies the
    EVAL MATH on verified-equal inputs).

    Per query: recall@k (integer ppm, floor) and binary-relevance
    NDCG@k quantized to the q40 grid (log2 discounts evaluated in rank
    order — a fixed summation order, deterministic on both sides); sums
    over queries are exact integers.  Returns
    (method, n_queries, mean_recall_ppm, sum_ndcg_q40) sorted by method.
    Pinned from `oracle_dedup.ann_eval_rows`.
    """
    truth = [
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ann_topk_bruteforce(sf_dir, num_queries=num_queries, k=k).take_all()
    ]
    lsh = [
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ann_topk_lsh(sf_dir, num_queries=num_queries, k=k).take_all()
    ]
    ivf = [
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ann_topk_ivf(sf_dir, num_queries=num_queries, k=k).take_all()
    ]
    rows = _eval_rows_from_lists(truth, {"ivf": ivf, "lsh": lsh}, k=k)
    return pa.table(
        {
            "method": pa.array([r[0] for r in rows], pa.string()),
            "n_queries": pa.array([r[1] for r in rows], pa.int64()),
            "mean_recall_ppm": pa.array([r[2] for r in rows], pa.int64()),
            "sum_ndcg_q40": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def ann_eval_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `ann_eval_report`: (n_rows, digest)."""
    from .interpret import DIGEST_MOD, row_digest

    t = ann_eval_report(sf_dir)
    dg = 0
    for i in range(t.num_rows):
        pay = "\x1f".join(
            str(t.column(c)[i].as_py())
            for c in ("n_queries", "mean_recall_ppm", "sum_ndcg_q40")
        )
        dg = (dg + row_digest(t.column("method")[i].as_py(), pay)) % DIGEST_MOD
    return pa.table(
        {
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


# --- binary quantization (1-bit) search --------------------------------------
BQ_GRID = 1 << 20
BQ_CANDIDATES = 256


def _bq_bits(x: np.ndarray, thr_num: np.ndarray, thr_den: int) -> np.ndarray:
    """Per-dim sign bits against the EXACT mean threshold: bit_d = 1 iff
    round(x_d·2^20)·n > Σ_corpus round(x_d·2^20) — integer comparison, so
    the codebook is bit-identical under any batching.  Returns (n, d/8)
    packed uint8."""
    xq = np.round(x * BQ_GRID).astype(np.int64)
    bits = (xq * thr_den) > thr_num[None, :]
    return np.packbits(bits, axis=1)


def bq_topk(
    sf_dir: str,
    *,
    num_queries: int = 8,
    k: int = 5,
    n_candidates: int = BQ_CANDIDATES,
) -> pa.Table:
    """Binary-quantization search: the corpus rides as ONE BIT per
    dimension (sign against the per-dim corpus mean — 64× smaller than
    float32; the rerank-era default of vector stores), candidates surface
    by Hamming distance over XOR+popcount, and the top ``n_candidates``
    per query rerank EXACTLY on the 2^20 integer-grid dot product (the
    `sq8_topk` scoring convention).

    Exactness: the mean threshold is the integer comparison
    ``x_q·n > Σx_q`` (no float mean anywhere), Hamming is integer, the
    candidate cut is (hamming ASC, vec_id ASC) — a total order — and
    rerank scores are exact int64, so the whole result is bit-identical
    under any batching; pinned from the independent sequential
    `oracle_dedup.bq_rows` via `bq_digest`, with a measured recall floor
    vs `ann_topk_bruteforce` in pytest.  Measured candidate recall vs the
    exact same-metric top-5 at sf0.01: 0.725 @ C=64, 0.875 @ C=128,
    1.0 @ C=256 — unrotated mean-sign bits are coarse on clustered
    embeddings, which is WHY production BQ reranks at 10-100×k
    oversampling (the default here, C=256 = 51×k); a seeded random
    rotation before the sign (the `embedding_near_dup_lsh` hyperplane
    trick) is the recall upgrade path at unchanged storage.

    Scale shape: one corpus pass folds the d-sized q20 sum vector
    (exact int partials); one corpus pass encodes + scores Hamming with
    the query codes broadcast, per-batch partial top-``n_candidates``
    carrying the raw vector for rerank — candidate-count rows per query
    per batch, the corpus never shuffles.  Returns (query_id, rank,
    vec_id, score_q).
    """
    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def sum_partial(batch: pa.Table) -> pa.Table:
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        if not len(m):
            return pa.table(
                {
                    "s": pa.array([], pa.list_(pa.int64())),
                    "n": pa.array([], pa.int64()),
                }
            )
        xq = np.round(m * BQ_GRID).astype(np.int64)
        return pa.table(
            {
                "s": pa.array([xq.sum(axis=0).tolist()], pa.list_(pa.int64())),
                "n": pa.array([len(m)], pa.int64()),
            }
        )

    parts = emb.map_batches(sum_partial, batch_format="pyarrow").take_all()
    thr_num = np.sum([r["s"] for r in parts], axis=0).astype(np.int64)
    n_total = int(sum(r["n"] for r in parts))

    qids, _, qraw = _load_queries(sf_dir, num_queries)
    qcodes = _bq_bits(qraw, thr_num, n_total)
    qq = np.round(qraw * BQ_GRID).astype(np.int64)
    ref = ray.put((qids, qcodes, qq, thr_num, n_total))

    def hamming_candidates(batch: pa.Table, *, ref) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "ham": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float64())),
            }
        )
        if batch.num_rows == 0:
            return empty
        bqids, bqcodes, _, bthr, bn = ray.get(ref)
        vid = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        codes = _bq_bits(m, bthr, bn)
        topn = min(n_candidates, len(vid))
        qp, vp, hp, ep = [], [], [], []
        for qi in range(len(bqids)):
            x = np.unpackbits(codes ^ bqcodes[qi][None, :], axis=1)
            ham = x.sum(axis=1).astype(np.int64)
            ham[vid == bqids[qi]] = np.iinfo(np.int64).max  # exclude self
            order = np.lexsort((vid, ham))[:topn]
            keep = ham[order] != np.iinfo(np.int64).max
            order = order[keep]
            qp.append(np.full(len(order), bqids[qi], dtype=np.int64))
            vp.append(vid[order])
            hp.append(ham[order])
            ep.append(order)
        rows = np.concatenate(ep)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qp), pa.int64()),
                "vec_id": pa.array(np.concatenate(vp), pa.int64()),
                "ham": pa.array(np.concatenate(hp), pa.int64()),
                "embedding": pa.array(
                    [m[i].tolist() for i in rows], pa.list_(pa.float64())
                ),
            }
        )

    partials = emb.map_batches(
        hamming_candidates, batch_format="pyarrow", batch_size=1024, fn_kwargs={"ref": ref}
    )

    def rerank(group: pa.Table, *, ref) -> pa.Table:
        bqids, _, bqq, _, _ = ray.get(ref)
        qid = group.column("query_id")[0].as_py()
        vid = np.array(group.column("vec_id").to_pylist(), dtype=np.int64)
        ham = np.array(group.column("ham").to_pylist(), dtype=np.int64)
        m = np.array(group.column("embedding").to_pylist(), dtype=np.float64)
        order = np.lexsort((vid, ham))[: min(n_candidates, len(vid))]
        vid, m = vid[order], m[order]
        qi = int(np.nonzero(bqids == qid)[0][0])
        xq = np.round(m * BQ_GRID)
        # float64 GEMV over int-valued operands — exact (|terms| << 2^53)
        score = (xq @ bqq[qi].astype(np.float64)).astype(np.int64)
        top = np.lexsort((vid, -score))[: min(k, len(vid))]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(top), pa.int64()),
                "rank": pa.array(range(1, len(top) + 1), pa.int64()),
                "vec_id": pa.array(vid[top], pa.int64()),
                "score_q": pa.array(score[top], pa.int64()),
            }
        )

    res = (
        partials.groupby("query_id")
        .map_groups(rerank, batch_format="pyarrow", fn_kwargs={"ref": ref})
        .sort(["query_id", "rank"])
        .take_all()
    )
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in res], pa.int64()),
            "rank": pa.array([r["rank"] for r in res], pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in res], pa.int64()),
            "score_q": pa.array([r["score_q"] for r in res], pa.int64()),
        }
    )


def bq_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `bq_topk`: (n_rows, digest), pinned from the
    independent sequential `oracle_dedup.bq_rows`."""
    from .interpret import DIGEST_MOD, row_digest

    t = bq_topk(sf_dir, **kwargs)
    dg = 0
    for i in range(t.num_rows):
        key = f"{t.column('query_id')[i].as_py()}\x1f{t.column('rank')[i].as_py()}"
        pay = f"{t.column('vec_id')[i].as_py()}\x1f{t.column('score_q')[i].as_py()}"
        dg = (dg + row_digest(key, pay)) % DIGEST_MOD
    return pa.table(
        {
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


# --- cluster-outlier QA ------------------------------------------------------
OUTLIER_FACTOR = 4  # flag dq > factor × cluster median


def cluster_outlier_stats(
    sf_dir: str, *, k: int = 8, iters: int = 5, factor: int = OUTLIER_FACTOR
) -> pa.Table:
    """Embedding-cluster outlier QA: assign every vector to its
    deterministic k-means cluster, measure the EXACT integer squared
    distance to the centroid on the 2^20 grid, and report per cluster the
    median distance and how many members sit beyond ``factor ×`` that
    median — the distance-based outlier sweep run before trusting
    cluster-balanced curation (`semantic_dedup` / `cluster_topics`).

    Exactness: dq = Σ_j (round(x_j·2^20) − round(c_j·2^20))² is int64;
    the median is the ⌈n/2⌉-th smallest (lower median — integer, no
    float averaging); the outlier test is an integer comparison.  Pinned
    from the independent sequential `oracle_dedup.cluster_outlier_rows`
    via `cluster_outlier_digest`.

    Scale shape: one broadcast-centroid pass emits (cluster, dq) ints;
    one k-way groupby; the per-cluster kernel is member-count sized (the
    exact-median selection generalizes to the two-pass histogram select
    of `price_outliers` beyond RAM).  Returns (cluster, n_vectors,
    median_dq, n_outliers, outlier_ppm) sorted by cluster.
    """
    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    centroids = _kmeans_centroids(emb, k=k, iters=iters)
    cq = np.round(centroids * (1 << 20)).astype(np.int64)
    cref = ray.put((centroids, cq))

    def dists(batch: pa.Table) -> pa.Table:
        c, cqb = ray.get(cref)
        if batch.num_rows == 0:
            return pa.table(
                {"cluster": pa.array([], pa.int32()), "dq": pa.array([], pa.int64())}
            )
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        a = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        xq = np.round(m * (1 << 20)).astype(np.int64)
        diff = xq - cqb[a]
        dq = (diff * diff).sum(axis=1)
        return pa.table(
            {"cluster": pa.array(a.astype(np.int32)), "dq": pa.array(dq)}
        )

    def stats(group: pa.Table) -> pa.Table:
        ci = group.column("cluster")[0].as_py()
        dq = np.sort(
            group.column("dq").combine_chunks().to_numpy(zero_copy_only=False)
        )
        n = len(dq)
        med = int(dq[(n - 1) // 2])
        nout = int((dq > factor * med).sum())
        return pa.table(
            {
                "cluster": pa.array([ci], pa.int32()),
                "n_vectors": pa.array([n], pa.int64()),
                "median_dq": pa.array([med], pa.int64()),
                "n_outliers": pa.array([nout], pa.int64()),
                "outlier_ppm": pa.array([nout * 1_000_000 // n], pa.int64()),
            }
        )

    rows = (
        emb.map_batches(dists, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(stats, batch_format="pyarrow")
        .sort("cluster")
        .take_all()
    )
    return pa.table(
        {
            "cluster": pa.array([r["cluster"] for r in rows], pa.int32()),
            "n_vectors": pa.array([r["n_vectors"] for r in rows], pa.int64()),
            "median_dq": pa.array([r["median_dq"] for r in rows], pa.int64()),
            "n_outliers": pa.array([r["n_outliers"] for r in rows], pa.int64()),
            "outlier_ppm": pa.array([r["outlier_ppm"] for r in rows], pa.int64()),
        }
    )


def cluster_outlier_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `cluster_outlier_stats`: (n_rows, digest)."""
    from .interpret import DIGEST_MOD, row_digest

    t = cluster_outlier_stats(sf_dir, **kwargs)
    dg = 0
    for i in range(t.num_rows):
        pay = "\x1f".join(
            str(t.column(c)[i].as_py())
            for c in ("n_vectors", "median_dq", "n_outliers", "outlier_ppm")
        )
        dg = (dg + row_digest(str(t.column("cluster")[i].as_py()), pay)) % DIGEST_MOD
    return pa.table(
        {
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


# --- query-directed multi-probe LSH ------------------------------------------
MP_PLANES = 10
MP_PROBES = 32


def _probe_sets(margins: np.ndarray, num_probes: int) -> list[tuple[int, ...]]:
    """Query-directed perturbation sequence (Lv et al., VLDB 2007): the
    ``num_probes`` flip-sets with the smallest Σ margin² over the query's
    hyperplane margins, generated with the shift/expand heap.  Entry 0 is
    the exact bucket (no flips).  Deterministic: heap entries tie-break
    on the position tuple."""
    import heapq

    order = np.argsort(margins, kind="stable")
    m = margins[order]
    out: list[tuple[int, ...]] = [()]
    if not len(m):
        return out
    heap: list[tuple[float, tuple[int, ...]]] = [(float(m[0] * m[0]), (0,))]
    seen: set[tuple[int, ...]] = set()
    while heap and len(out) < num_probes:
        cost, s = heapq.heappop(heap)
        if s in seen:
            continue
        seen.add(s)
        out.append(tuple(int(order[p]) for p in s))
        last = s[-1]
        if last + 1 < len(m):
            heapq.heappush(
                heap,
                (cost - float(m[last] * m[last]) + float(m[last + 1] * m[last + 1]),
                 s[:-1] + (last + 1,)),
            )
            heapq.heappush(
                heap, (cost + float(m[last + 1] * m[last + 1]), s + (last + 1,))
            )
    return out


def ann_topk_lsh_multiprobe(
    sf_dir: str,
    *,
    num_queries: int = 8,
    k: int = 5,
    num_planes: int = MP_PLANES,
    num_probes: int = MP_PROBES,
) -> pa.Table:
    """Multi-probe LSH ANN: FINER buckets (16 planes → 65k cells instead
    of `ann_topk_lsh`'s 256) probed along the query-directed perturbation
    sequence — the memory/recall trade vector stores actually ship
    (fewer tables, each probed T times, instead of T independent
    tables).  A candidate is scored only if its bucket is one of the
    query's ``num_probes`` smallest-Σmargin² flip-sets.

    Determinism: margins and probe costs are float64 computed identically
    in the sequential oracle; heap ties break on the flip tuple.  The
    scoring machinery is `ann_topk_lsh`'s bucket-grouped matmul; results
    pin via `ann_mp_digest` from `oracle_dedup.multiprobe_rows`, with
    measured recall vs brute force in pytest and the per-query probe
    volume ≤ num_probes buckets by construction.

    Measured honestly: on THIS corpus single-table hyperplane LSH is
    angle-mismatched (top-5 cosine neighbors rarely share fine buckets
    — the existing `ann_topk_lsh` reads 0.075/0.125 recall@5 vs brute
    at sf0.001/sf0.01, and multi-probe at EQUAL candidate budget reads
    the same 0.05–0.10, doubling 16→32 probes), which is exactly WHY
    the near-dup operators use 48-band OR-amplification instead.  What
    multi-probe adds is the decoupled knob: recall scales with
    ``num_probes`` at FIXED table fineness/memory, where Hamming-1's
    budget is locked to the plane count.
    """
    qids, qmat, _ = _load_queries(sf_dir, num_queries)
    planes = _hyperplanes(qmat.shape[1], num_planes)
    proj = qmat @ planes.T  # (queries × planes) signed margins
    qbuckets = (
        (proj > 0).astype(np.uint32) << np.arange(num_planes, dtype=np.uint32)
    ).sum(axis=1)
    probe: dict[int, set[int]] = {}
    for qi in range(len(qids)):
        base = int(qbuckets[qi])
        for flips in _probe_sets(np.abs(proj[qi]), num_probes):
            b = base
            for p in flips:
                b ^= 1 << p
            probe.setdefault(b, set()).add(qi)
    ref = ray.put((qids, qmat, planes, probe))

    def bucket_score(batch: pa.Table, *, ref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        bqids, bqmat, bplanes, bprobe = ray.get(ref)
        vid = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        mn = m / n[:, None]
        buckets = _bucket_of(mn, bplanes)
        chunks_q, chunks_v, chunks_s = [], [], []
        order = np.argsort(buckets, kind="stable")
        sb = buckets[order]
        cuts = np.nonzero(np.diff(sb))[0] + 1
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [len(sb)]]) if len(sb) else np.array([], dtype=int)
        for s0, e0 in zip(starts, ends):
            qidx = bprobe.get(int(sb[s0]), ())
            if not qidx:
                continue
            rows = order[s0:e0]
            qarr = np.fromiter(qidx, dtype=np.int64, count=len(qidx))
            sims = mn[rows] @ bqmat[qarr].T
            v = np.repeat(vid[rows], len(qarr))
            q = np.tile(bqids[qarr], len(rows))
            keep = v != q
            chunks_q.append(q[keep])
            chunks_v.append(v[keep])
            chunks_s.append(sims.ravel()[keep])
        empty_i = np.array([], dtype=np.int64)
        empty_f = np.array([], dtype=np.float64)
        return pa.table(
            {
                "query_id": pa.array(
                    np.concatenate(chunks_q) if chunks_q else empty_i, pa.int64()
                ),
                "vec_id": pa.array(
                    np.concatenate(chunks_v) if chunks_v else empty_i, pa.int64()
                ),
                "score": pa.array(
                    np.concatenate(chunks_s) if chunks_s else empty_f, pa.float64()
                ),
            }
        )

    emb = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = emb.map_batches(
        bucket_score, batch_format="pyarrow", batch_size=1024, fn_kwargs={"ref": ref}
    )

    def _final_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("score").to_pylist(), group.column("vec_id").to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group.column("query_id")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
                "vec_id": pa.array([v for _, v in rows], pa.int64()),
            }
        )

    return (
        partials.groupby("query_id")
        .map_groups(_final_topk, batch_format="pyarrow")
        .sort(["query_id", "rank"])
    )


def ann_mp_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `ann_topk_lsh_multiprobe`: (n_rows, digest),
    pinned from the independent sequential `oracle_dedup.multiprobe_rows`."""
    from .interpret import DIGEST_MOD, row_digest

    rows = ann_topk_lsh_multiprobe(sf_dir, **kwargs).take_all()
    dg = 0
    for r in rows:
        dg = (
            dg + row_digest(f"{r['query_id']}\x1f{r['rank']}", str(r["vec_id"]))
        ) % DIGEST_MOD
    return pa.table(
        {
            "n_rows": pa.array([len(rows)], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


def ann_eval2_report(sf_dir: str, *, num_queries: int = 8, k: int = 5) -> pa.Table:
    """`ann_eval_report` for the r4c13 search paths: recall@k / NDCG@k of
    the binary-quantization and multi-probe-LSH results against the
    exact brute-force truth — closing the eval loop over every
    approximate path in the module (lsh/ivf in `ann_eval_report`,
    bq/multiprobe here; both inputs independently digest-gated, so this
    verifies the EVAL MATH on verified-equal lists).  Returns (method,
    n_queries, mean_recall_ppm, sum_ndcg_q40) sorted; pinned from
    `oracle_dedup.ann_eval2_rows`.
    """
    truth = [
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ann_topk_bruteforce(sf_dir, num_queries=num_queries, k=k).take_all()
    ]
    bq = bq_topk(sf_dir, num_queries=num_queries, k=k)
    bq_rows_list = [
        (bq.column("query_id")[i].as_py(), bq.column("rank")[i].as_py(),
         bq.column("vec_id")[i].as_py())
        for i in range(bq.num_rows)
    ]
    mp = [
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ann_topk_lsh_multiprobe(
            sf_dir, num_queries=num_queries, k=k
        ).take_all()
    ]
    rows = _eval_rows_from_lists(
        truth, {"bq": bq_rows_list, "multiprobe": mp}, k=k
    )
    return pa.table(
        {
            "method": pa.array([r[0] for r in rows], pa.string()),
            "n_queries": pa.array([r[1] for r in rows], pa.int64()),
            "mean_recall_ppm": pa.array([r[2] for r in rows], pa.int64()),
            "sum_ndcg_q40": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def ann_eval2_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `ann_eval2_report`: (n_rows, digest)."""
    from .interpret import DIGEST_MOD, row_digest

    t = ann_eval2_report(sf_dir)
    dg = 0
    for i in range(t.num_rows):
        pay = "\x1f".join(
            str(t.column(c)[i].as_py())
            for c in ("n_queries", "mean_recall_ppm", "sum_ndcg_q40")
        )
        dg = (dg + row_digest(t.column("method")[i].as_py(), pay)) % DIGEST_MOD
    return pa.table(
        {
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )
