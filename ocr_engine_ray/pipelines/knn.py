"""Exact k-nearest-neighbor graph over the ``embeddings`` table.

The kNN graph is the workhorse of embedding-space curation (semantic
dedup seeding, hard-negative mining for contrastive training, graph-based
clustering, kNN-LM retrieval indexes): for EVERY vector, its k most
similar neighbors — not just for a small query set like ``ann_topk``.

Similarity = exact integer dot product on the PCA fixed-point grid
(q = round_even(x * 2^20), the `pca.py` / `lm.py` quantization contract):
products ≤ 2^40 and 64-dim sums ≤ 2^46 stay below 2^53, so a float64
GEMM computes them EXACTLY and the ranking (dot DESC, neighbor_id ASC) is
a total order with no float-margin caveat — the DuckDB unnest-self-join
twin reproduces every dot bit-for-bit.

Scale shape (the `dedup.embedding_near_dup` block-pair cartesian,
reference parallel: the per-request sequential loop at
/root/reference/app.py:720-733 has no all-pairs analog — this is a
beyond-reference operator):

1. vectors hash into B = ceil(N / block_rows) blocks by vec_id; each
   vector is replicated to its B block-pairs (ONE shuffle of B × N rows —
   no full-table broadcast, nothing corpus-sized on the driver);
2. ``groupby(block)`` runs one GEMM per block pair and emits each side's
   in-pair top-k candidates only — ≤ k rows per (vector, block-pair), so
   the second shuffle moves O(N · B · k) candidate rows, never N²;
3. a vec_id-bucket groupby selects the global top-k per vector from its
   ≤ B·k candidates (vectorized lexsort ranking, many vectors per group).

Every unordered pair is scored in exactly ONE group, so candidates are
already distinct and the global top-k needs no dedup.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..sources.tables import sf_table
from .pca import PCA_Q

# Self-pair mask sentinel: far below any real dot (|dot| <= 2^46) and,
# unlike int64 min, negates without wrapping in the argsort(-dots) key.
_NEG_INF = np.int64(-(1 << 62))


def _quantized(group: pa.Table) -> np.ndarray:
    """(n, d) int64 matrix on the round_even(x * 2^20) grid (kept as
    float64 for the exact GEMM — all values are integers < 2^53)."""
    vecs = group.column("embedding").combine_chunks()
    flat = np.asarray(vecs.values, dtype=np.float64)
    offs = np.asarray(vecs.offsets, dtype=np.int64)
    widths = np.diff(offs)
    if len(widths) and not (widths == widths[0]).all():
        raise ValueError("ragged embedding column")
    d = int(widths[0]) if len(widths) else 0
    return np.round(flat * PCA_Q).reshape(len(group), d)


def _side_topk(
    vid_rows: np.ndarray, vid_cols: np.ndarray, dots: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row top-k of an (exact-integer) dots matrix by
    (dot DESC, neighbor_id ASC).  ``vid_cols`` MUST be ascending so the
    stable argsort's tie order is the neighbor-id order."""
    if dots.shape[0] == 0 or dots.shape[1] == 0:
        z = np.array([], dtype=np.int64)
        return z, z, z
    kk = min(k, dots.shape[1])
    # columns are neighbor-id-ascending; stable sort on -dot keeps that
    # order inside equal dots, giving the (dot DESC, neighbor ASC) ranking
    order = np.argsort(-dots, axis=1, kind="stable")[:, :kk]
    rows = np.repeat(vid_rows, kk)
    cols = vid_cols[order].ravel()
    vals = np.take_along_axis(dots, order, axis=1).ravel()
    keep = vals != _NEG_INF  # masked self-pairs on the diagonal block
    return rows[keep], cols[keep], vals[keep].astype(np.int64)


def knn_graph(
    sf_dir: str,
    *,
    k: int = 5,
    block_rows: int = 2048,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Exact cosine-free kNN graph: (vec_id, rank, neighbor_id, dot) with
    rank 1..k per vector by (dot DESC, neighbor_id ASC), self excluded.
    Byte-identical to the DuckDB quantized-dot self-join twin."""
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

    def pair_topk(group: pa.Table) -> pa.Table:
        block = group.column("block")[0].as_py()
        bi, bj = divmod(block, nblocks)
        vid = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        qm = _quantized(group)
        bkt = np.asarray(group.column("bucket").to_pylist())
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        if bi == bj:
            order = np.argsort(vid)  # ascending neighbor ids for tie order
            vid, qm = vid[order], qm[order]
            dots = (qm @ qm.T).astype(np.int64)  # float64 GEMM, exact here
            np.fill_diagonal(dots, _NEG_INF)
            parts.append(_side_topk(vid, vid, dots, k))
        else:
            li, lj = bkt == bi, bkt == bj
            va, vb = vid[li], vid[lj]
            oa, ob = np.argsort(va), np.argsort(vb)
            va, vb = va[oa], vb[ob]
            qa, qb = qm[li][oa], qm[lj][ob]
            dots = (qa @ qb.T).astype(np.int64)
            parts.append(_side_topk(va, vb, dots, k))
            parts.append(_side_topk(vb, va, dots.T.copy(), k))
        rows = np.concatenate([p[0] for p in parts]) if parts else np.array([])
        cols = np.concatenate([p[1] for p in parts]) if parts else np.array([])
        vals = np.concatenate([p[2] for p in parts]) if parts else np.array([])
        return pa.table(
            {
                "vec_id": pa.array(rows.astype(np.int64), pa.int64()),
                "neighbor_id": pa.array(cols.astype(np.int64), pa.int64()),
                "dot": pa.array(vals.astype(np.int64), pa.int64()),
                "vbkt": pa.array(
                    (rows.astype(np.int64) % num_buckets).astype(np.int32)
                ),
            }
        )

    def global_topk(group: pa.Table) -> pa.Table:
        vid = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        nbr = np.asarray(group.column("neighbor_id").to_pylist(), dtype=np.int64)
        dot = np.asarray(group.column("dot").to_pylist(), dtype=np.int64)
        # (vec ASC, dot DESC, neighbor ASC) — run boundaries give per-vec rank
        order = np.lexsort((nbr, -dot, vid))
        sv = vid[order]
        new = (
            np.concatenate([[True], sv[1:] != sv[:-1]])
            if len(sv)
            else np.array([], bool)
        )
        run_starts = np.nonzero(new)[0]
        run_id = np.cumsum(new) - 1
        rank = np.arange(len(sv)) - run_starts[run_id] + 1
        keep = rank <= k
        return pa.table(
            {
                "vec_id": pa.array(sv[keep], pa.int64()),
                "rank": pa.array(rank[keep].astype(np.int64), pa.int64()),
                "neighbor_id": pa.array(nbr[order][keep], pa.int64()),
                "dot": pa.array(dot[order][keep], pa.int64()),
            }
        )

    # Input batch size shrinks with the replication factor so a replicated
    # output block stays ~block_rows rows regardless of corpus size.
    return (
        emb.map_batches(
            replicate,
            batch_format="pyarrow",
            batch_size=max(64, block_rows // nblocks),
        )
        .groupby("block")
        .map_groups(pair_topk, batch_format="pyarrow")
        .groupby("vbkt")
        .map_groups(global_topk, batch_format="pyarrow")
        .sort(["vec_id", "rank"])
    )


def knn_graph_reference(sf_dir: str, *, k: int = 5) -> pa.Table:
    """Independent naive reference (single-process, full N² matrix) for
    tests — no shared code with the distributed path beyond the grid."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vid = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.round(
        np.asarray(t.column("embedding").to_pylist(), dtype=np.float64) * PCA_Q
    ).astype(np.int64)
    order = np.argsort(vid)
    vid, m = vid[order], m[order]
    out = {"vec_id": [], "rank": [], "neighbor_id": [], "dot": []}
    for i in range(len(vid)):
        dots = m @ m[i]
        cand = sorted(
            ((int(dots[j]), int(vid[j])) for j in range(len(vid)) if j != i),
            key=lambda p: (-p[0], p[1]),
        )[:k]
        for r, (d, nb) in enumerate(cand, 1):
            out["vec_id"].append(int(vid[i]))
            out["rank"].append(r)
            out["neighbor_id"].append(nb)
            out["dot"].append(d)
    return pa.table(
        {
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
            "dot": pa.array(out["dot"], pa.int64()),
        }
    )


def mutual_knn_pairs(
    sf_dir: str, *, k: int = 5, num_buckets: int = 32
) -> rd.Dataset:
    """Mutual k-nearest-neighbor pairs: (a, b, dot) with a < b where EACH
    vector is in the other's exact top-k — the high-precision near-dup /
    matching criterion (reciprocal-NN is what keeps one-directional hub
    attraction out of match sets; the standard filter in image-matching
    and bitext mining).

    Built ON the exact `knn_graph` stream: each directed edge hashes by
    its unordered pair, ONE bucket shuffle co-locates the two directions,
    and a pair survives iff both arrived.  dot is the exact q20-grid
    integer (identical in both directions).  Full SQL twin (the knn twin
    joined to itself).  Returns rows sorted by (a, b).
    """
    g = knn_graph(sf_dir, k=k)

    def pair_key(batch: pa.Table) -> pa.Table:
        v = batch.column("vec_id").combine_chunks().to_numpy(zero_copy_only=False)
        w = batch.column("neighbor_id").combine_chunks().to_numpy(zero_copy_only=False)
        lo = np.minimum(v, w)
        hi = np.maximum(v, w)
        return pa.table(
            {
                "pbkt": pa.array(
                    ((lo * np.int64(1_000_003) + hi) % num_buckets).astype(np.int64)
                ),
                "lo": pa.array(lo),
                "hi": pa.array(hi),
                "dirn": pa.array((v < w).astype(np.int64)),
                "dot": batch.column("dot"),
            }
        )

    def mutual(group: pa.Table) -> pa.Table:
        lo = group.column("lo").combine_chunks().to_numpy(zero_copy_only=False)
        hi = group.column("hi").combine_chunks().to_numpy(zero_copy_only=False)
        dirn = group.column("dirn").combine_chunks().to_numpy(zero_copy_only=False)
        dot = group.column("dot").combine_chunks().to_numpy(zero_copy_only=False)
        mx = int(hi.max()) + 1 if len(hi) else 1
        key = lo * mx + hi
        order = np.argsort(key, kind="stable")
        sk = key[order]
        new = np.concatenate([[True], sk[1:] != sk[:-1]])
        starts = np.nonzero(new)[0]
        ends = np.concatenate([starts[1:], [len(sk)]])
        out_lo, out_hi, out_dot = [], [], []
        for s0, e0 in zip(starts, ends):
            idx = order[s0:e0]
            if len(set(dirn[idx].tolist())) == 2:  # both directions present
                out_lo.append(int(lo[idx[0]]))
                out_hi.append(int(hi[idx[0]]))
                out_dot.append(int(dot[idx[0]]))
        return pa.table(
            {
                "a": pa.array(out_lo, pa.int64()),
                "b": pa.array(out_hi, pa.int64()),
                "dot": pa.array(out_dot, pa.int64()),
            }
        )

    return (
        g.map_batches(pair_key, batch_format="pyarrow")
        .groupby("pbkt")
        .map_groups(mutual, batch_format="pyarrow")
        .sort(["a", "b"])
    )
