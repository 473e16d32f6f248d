"""Distributed PCA over the ``embeddings`` table (exact quantized moments).

Embedding-space analysis (whitening, dimensionality reduction before ANN or
SemDeDup-style clustering) needs the corpus covariance.  The only
corpus-sized work is the second-moment accumulation, and that is an exact
integer computation once the float32 vectors are quantized onto a fixed
grid:

    q = round_even(x * 2^20)   (int64; float32→float64 promotion is exact,
                                the scale is a power of two, and DuckDB
                                round_even == np.round — the lm.py grid
                                contract)

so every partial is Σ q_i q_j / Σ q_i / N over a batch — commutative int64
sums that fold to bit-identical totals under ANY batching, and the DuckDB
twin (unnest + self-join + SUM) reproduces them exactly.  Overflow bound:
|q| < 2^20, so a pair sum stays inside int64 up to ~2^23 rows per single
fold; above that the fold nests one more level (partials of partials, the
same reduceat shape) before any sum approaches 2^63 — at the gate scales a
single level is far inside the bound (asserted).

Scale shape: one pass over the embeddings table; each batch emits ONE
(d·(d+1)/2 + d + 1)-row partial (dim² is scale-free, 2145 rows at d=64),
and `fold.fold_int_sums_by_key` folds partials by flattened (i, j) key —
no shuffle of the embedding rows themselves, nothing corpus-sized on the
driver.  The eigendecomposition then happens driver-side on the d×d
covariance (`pca_components`) — a dim²-sized object, the legitimate small
result of the distributed pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from ..sources.tables import sf_table
from .fold import fold_int_sums_by_key

PCA_Q = float(1 << 20)  # fixed-point quantum for embedding values
_SUM_ROW = -1  # dim_j sentinel for first-moment rows; (-1,-1) row carries N


def _quantize(batch: pa.Table) -> np.ndarray:
    vecs = batch.column("embedding").combine_chunks()
    flat = np.asarray(vecs.values, dtype=np.float64)
    offs = np.asarray(vecs.offsets, dtype=np.int64)
    widths = np.diff(offs)
    if len(widths) and not (widths == widths[0]).all():
        raise ValueError("ragged embedding column")
    d = int(widths[0]) if len(widths) else 0
    return np.round(flat * PCA_Q).astype(np.int64).reshape(len(batch), d)


def embedding_gram(sf_dir: str) -> rd.Dataset:
    """Exact quantized second/first moments of the embedding corpus.

    Returns one row per (dim_i, dim_j) with 1-based dims and ``dim_i <=
    dim_j``: ``s`` = Σ q_i·q_j (upper-triangle gram), plus per-dim
    first-moment rows (dim_i, -1, Σ q_i) and the count row (-1, -1, N) —
    everything `pca_components` needs to form the covariance, in one
    dataset with a bit-exact SQL twin.
    """
    ds = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        q = _quantize(batch)
        n, d = q.shape
        if n == 0:
            return pa.table({"k": pa.array([], pa.int64()), "s": pa.array([], pa.int64())})
        # int64 gram: |q| < 2^20 → |q_i q_j| < 2^40; guard the single-fold
        # overflow bound (a second fold level lifts it — not needed here)
        assert n < (1 << 22), "nest the moment fold before sums approach 2^63"
        gram = q.T @ q  # numpy int64 matmul — exact
        iu, ju = np.triu_indices(d)
        # flattened fold key: (i+1)*(d+2) + (j+1); sums use j→0, count k=0
        keys = np.concatenate(
            [
                (iu + 1) * (d + 2) + (ju + 1),
                (np.arange(d) + 1) * (d + 2),
                np.array([0], np.int64),
            ]
        ).astype(np.int64)
        vals = np.concatenate(
            [gram[iu, ju], q.sum(axis=0, dtype=np.int64), np.array([n], np.int64)]
        )
        return pa.table({"k": pa.array(keys), "s": pa.array(vals)})

    folded = fold_int_sums_by_key(
        ds.map_batches(partial, batch_format="pyarrow"), key="k", cols=["s"]
    )

    # decoding the flattened key needs the stride d+2; the width is a table
    # property (constant per table), read from one row on the driver
    d = _embedding_dim(sf_dir)
    stride = d + 2

    def decode(batch: pa.Table) -> pa.Table:
        k = batch.column("k").combine_chunks().to_numpy(zero_copy_only=False)
        i = (k // stride).astype(np.int64)
        j = (k % stride).astype(np.int64)
        return pa.table(
            {
                "dim_i": pa.array(np.where(i == 0, -1, i)),
                "dim_j": pa.array(np.where(j == 0, _SUM_ROW, j)),
                "s": batch.column("s").cast(pa.int64()),
            }
        )

    return folded.map_batches(decode, batch_format="pyarrow").sort(["dim_i", "dim_j"])


def _embedding_dim(sf_dir: str) -> int:
    """Embedding width from one row (a table property, constant per table)."""
    ds = sf_table(sf_dir, "embeddings", columns=["embedding"])
    row = ds.take(1)
    return len(row[0]["embedding"]) if row else 0


def pca_components(sf_dir: str, *, n_components: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Top principal components of the embedding corpus.

    Consumes the `embedding_gram` moments (a dim²-sized take — scale-free),
    forms the covariance C = (S/N − μμᵀ) in float64 on the quantized grid,
    and eigendecomposes the d×d matrix driver-side.  Sign convention: each
    component's largest-|coordinate| entry is made positive, so results are
    reproducible run-to-run.  Returns (eigenvalues desc [r], components
    [r, d]) in ORIGINAL embedding units (the 2^-20 grid scale divides out).
    """
    rows = embedding_gram(sf_dir).take_all()
    n = 0
    sums: dict[int, int] = {}
    gram: dict[tuple[int, int], int] = {}
    for r in rows:
        i, j, s = r["dim_i"], r["dim_j"], r["s"]
        if i == -1:
            n = int(s)
        elif j == _SUM_ROW:
            sums[i - 1] = int(s)
        else:
            gram[(i - 1, j - 1)] = int(s)
    d = len(sums)
    if n == 0 or d == 0:
        return np.empty(0), np.empty((0, 0))
    s1 = np.array([sums[i] for i in range(d)], dtype=np.float64)
    g = np.zeros((d, d), dtype=np.float64)
    for (i, j), v in gram.items():
        g[i, j] = v
        g[j, i] = v
    mu = s1 / n
    cov = (g / n - np.outer(mu, mu)) / (PCA_Q * PCA_Q)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    vals = w[order]
    comps = v[:, order].T
    flip = comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)] < 0
    comps[flip] *= -1.0
    return vals, comps


def pca_project(sf_dir: str, *, n_components: int = 8) -> rd.Dataset:
    """Project every embedding onto the top components (one broadcast +
    one corpus map — the standard reduce-then-map PCA deployment)."""
    import ray

    vals, comps = pca_components(sf_dir, n_components=n_components)
    ref = ray.put(comps.astype(np.float64))
    ds = sf_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def project(batch: pa.Table) -> pa.Table:
        comps_b = ray.get(ref)
        q = _quantize(batch) / PCA_Q
        proj = q @ comps_b.T
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "projection": pa.array(list(proj), pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


CENTROID_GRID = 1 << 20  # fixed-point grid for exact distributed mean


def label_centroids(sf_dir: str) -> rd.Dataset:
    """Per-label embedding centroids on an exact integer grid — the class-
    centroid primitive (classifier init, IVF seeding, per-class drift
    monitoring) computed so the distributed mean is BIT-IDENTICAL to the
    sequential twin: each component is quantized to ``round(x · 2^20)``
    int64 before summing (integer sums are order-independent; float sums
    are not), and the mean is the exact integer quotient ``sum_q // n``.

    Scale shape: per-batch numpy fold collapses each batch to ≤ labels ×
    dims partial rows (label, dim, sum_q, n) — the ONLY thing shuffled; the
    final groupby moves labels × dims × blocks tiny rows.  The corpus
    itself never shuffles; null-label rows are excluded (twin's GROUP BY
    drops them via WHERE).

    Returns (label, dim, centroid_q, n_vecs) sorted by (label, dim); twin
    is the unnest WITH ORDINALITY SQL.
    """
    import numpy as np

    emb = sf_table(sf_dir, "embeddings", columns=["embedding", "label"])

    def partials(batch: pa.Table) -> pa.Table:
        lab_py = batch.column("label").to_pylist()
        keep = [i for i, v in enumerate(lab_py) if v is not None]
        if not keep:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "sum_q": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        batch = batch.take(pa.array(keep, pa.int64()))
        lab = np.array([lab_py[i] for i in keep], dtype=np.int64)
        m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        # half-away rounding to the grid, matching DuckDB round()
        q = np.where(m >= 0, np.floor(m * CENTROID_GRID + 0.5),
                     np.ceil(m * CENTROID_GRID - 0.5)).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        dims = q.shape[1]
        sums = np.zeros((len(ulab), dims), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(ulab, dims)),
                "dim": pa.array(np.tile(np.arange(1, dims + 1, dtype=np.int64), len(ulab))),
                "sum_q": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(counts, dims)),
            }
        )

    agg = (
        emb.map_batches(partials, batch_format="pyarrow", batch_size=4096)
        .groupby(["label", "dim"])
        .aggregate(Sum("sum_q", alias_name="sum_q"), Sum("n", alias_name="n_vecs"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        s = batch.column("sum_q").to_numpy(zero_copy_only=False)
        n = np.maximum(batch.column("n_vecs").to_numpy(zero_copy_only=False), 1)
        # TRUNCATING integer quotient: DuckDB's BIGINT `//` rounds toward
        # zero on negatives, numpy's `//` floors — sign-split to match
        cq = np.sign(s) * (np.abs(s) // n)
        return pa.table(
            {
                "label": batch.column("label").cast(pa.int64()),
                "dim": batch.column("dim"),
                "centroid_q": pa.array(cq.astype(np.int64)),
                "n_vecs": batch.column("n_vecs").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(["label", "dim"])
