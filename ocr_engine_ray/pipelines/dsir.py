"""DSIR-style data selection over the ``documents`` table.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023 —
public) selects pretraining documents that look like a small TARGET domain:
fit bag-of-hashed-n-gram unigram models for the target and the raw pool,
score every raw document by its log importance weight

    log w(doc) = sum over feature occurrences f of
                 ln p_target(bucket(f)) - ln p_raw(bucket(f))

and keep the top-weighted documents.  Features are unigrams and adjacent
bigrams of the ASCII ``\\S+`` tokens, hashed into a FIXED number of buckets
(the paper's trick: the model is constant-size regardless of vocabulary, so
it broadcasts for free at any corpus scale).

Exactness contract (the lm.py pattern): all bucket counts are integers; the
only floats are the per-bucket ``ln`` terms, and each bucket's term is
quantized ONCE to ``round_even((ln p_t - ln p_r) * 2^40)`` int64 — per-doc
scores are then EXACT integer sums (order-free, batch-independent) and the
DuckDB twin reproduces them bit-for-bit (DuckDB ``ln`` == numpy ``log``,
``round_even`` == ``np.round``, and the md5-prefix bucket hash is the
verified `cms_token_counts` kernel).  Smoothing is add-one over the
``num_buckets`` feature space.

Scale shape:

1. ONE corpus pass emits per-batch per-bucket (target, raw) count partials
   — ≤ ``num_buckets`` rows per batch regardless of batch size — and one
   tiny groupby folds them; only the folded ``num_buckets`` cells (64 KiB
   at the default 4096) reach the driver, which quantizes the per-bucket
   terms and broadcasts the int64 vector via ``ray.put``.
2. ONE scoring pass over the raw pool computes each doc's exact integer
   score locally (no shuffle), keeps each block's local top-k (the global
   top-k is a subset of the union of block top-ks), and a k-row sort+limit
   finishes.

The reference has no corpus-level selection (SURVEY.md §2.6); this is part
of the beyond-reference training-data layer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..sources.tables import sf_table
from .textstats import _token_occurrences

DSIR_BUCKETS = 4096  # hashed feature space (constant-size model)
DSIR_Q = 1099511627776.0  # 2^40 fixed-point quantum for the ln terms
DSIR_TARGET = "src0"  # the synthetic corpus's stand-in for the target domain
DSIR_K = 50


def _feat_buckets(feats: list[str], num_buckets: int) -> np.ndarray:
    """Bucket of each feature string: ``md5(feat)[:8 hex] % num_buckets`` —
    the identical expression the DuckDB twin spells as
    ``('0x' || substr(md5(feat), 1, 8))::UBIGINT % B`` (the bit-equal
    `cms_token_counts` hash kernel)."""
    return np.fromiter(
        (
            int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % num_buckets
            for f in feats
        ),
        dtype=np.int64,
        count=len(feats),
    )


def doc_feature_counts_batch(
    texts: list[str | None], num_buckets: int = DSIR_BUCKETS
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hashed-feature occurrence counts of a batch as ``(row_idx, bucket,
    count)`` int64 arrays, row-major (rows nondecreasing).  Features are
    the ``'u:' + token`` unigrams plus ``'b:' + w1 + ' ' + w2`` adjacent
    bigrams (tokens are ``\\S+`` runs, so the space join is unambiguous);
    one md5 per DISTINCT token / distinct bigram per batch."""
    e = np.empty(0, np.int64)
    if not texts:
        return e, e.copy(), e.copy()
    rows, codes, dic = _token_occurrences(texts)
    if not len(codes):
        return e, e.copy(), e.copy()
    words = dic.to_pylist()
    ubkt = _feat_buckets(["u:" + w for w in words], num_buckets)
    all_rows = [rows]
    all_b = [ubkt[codes]]
    adj = rows[1:] == rows[:-1]
    if adj.any():
        nd = len(words)
        pkey = codes[:-1][adj].astype(np.int64) * nd + codes[1:][adj]
        upair, pinv = np.unique(pkey, return_inverse=True)
        bbkt = _feat_buckets(
            [f"b:{words[p // nd]} {words[p % nd]}" for p in upair.tolist()],
            num_buckets,
        )
        all_rows.append(rows[:-1][adj])
        all_b.append(bbkt[pinv])
    r = np.concatenate(all_rows)
    b = np.concatenate(all_b)
    # compress per (row, bucket) occurrence multiplicities
    key = r * num_buckets + b
    uk, cnt = np.unique(key, return_counts=True)
    return uk // num_buckets, uk % num_buckets, cnt.astype(np.int64)


def _lambda_ref(
    docs: rd.Dataset, *, target_source: str, num_buckets: int
) -> "ray.ObjectRef":
    """Fit both hashed-unigram models in one corpus pass and broadcast the
    quantized per-bucket log-ratio vector (int64[num_buckets])."""

    def partial(batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        r, b, c = doc_feature_counts_batch(
            batch.column("text").to_pylist(), num_buckets
        )
        # null-source docs count in NEITHER model (the SQL twin's
        # `source = 'src0'` / `source <> 'src0'` are both NULL-false there)
        is_t = np.fromiter(
            (s == target_source for s in srcs), dtype=bool, count=len(srcs)
        )
        is_r = np.fromiter(
            (s is not None and s != target_source for s in srcs),
            dtype=bool,
            count=len(srcs),
        )
        tm = is_t[r] if len(r) else np.zeros(0, bool)
        rm = is_r[r] if len(r) else np.zeros(0, bool)
        ct = np.zeros(num_buckets, np.int64)
        cr = np.zeros(num_buckets, np.int64)
        np.add.at(ct, b[tm], c[tm])
        np.add.at(cr, b[rm], c[rm])
        nz = np.nonzero(ct | cr)[0]
        return pa.table(
            {
                "b": pa.array(nz),
                "ct": pa.array(ct[nz]),
                "cr": pa.array(cr[nz]),
            }
        )

    cells = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("ct", alias_name="ct"), Sum("cr", alias_name="cr"))
        .take_all()  # <= num_buckets rows: constant-size at any corpus
    )
    ct = np.zeros(num_buckets, np.int64)
    cr = np.zeros(num_buckets, np.int64)
    for row in cells:
        ct[row["b"]] = row["ct"]
        cr[row["b"]] = row["cr"]
    tot_t = int(ct.sum())
    tot_r = int(cr.sum())
    # quantized per-bucket term — same association as the SQL twin:
    # round_even((ln((ct+1)/(tot_t+B)) - ln((cr+1)/(tot_r+B))) * 2^40)
    lam = np.round(
        (
            np.log((ct + 1.0) / float(tot_t + num_buckets))
            - np.log((cr + 1.0) / float(tot_r + num_buckets))
        )
        * DSIR_Q
    ).astype(np.int64)
    return ray.put(lam)


def dsir_select(
    sf_dir: str,
    *,
    target_source: str = DSIR_TARGET,
    k: int = DSIR_K,
    num_buckets: int = DSIR_BUCKETS,
) -> rd.Dataset:
    """Select the ``k`` raw-pool documents most like ``target_source`` by
    DSIR importance weight.  Returns (doc_id, n_feats, logw_q) — the exact
    integer score and the feature-occurrence count — for the top ``k``
    docs by (logw_q DESC, doc_id), sorted the same way.  Raw docs with no
    tokens carry no features and are never selected (absent from the SQL
    twin's join as well)."""
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    lam_ref = _lambda_ref(
        docs, target_source=target_source, num_buckets=num_buckets
    )
    raw = docs.filter(expr=f"source != '{target_source}'")

    def score(batch: pa.Table) -> pa.Table:
        lam = ray.get(lam_ref)
        ids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        r, b, c = doc_feature_counts_batch(
            batch.column("text").to_pylist(), num_buckets
        )
        if not len(r):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_feats": pa.array([], pa.int64()),
                    "logw_q": pa.array([], pa.int64()),
                }
            )
        # rows are nondecreasing (np.unique of row-major keys) → reduceat
        new = np.concatenate([[True], r[1:] != r[:-1]])
        starts = np.nonzero(new)[0]
        return pa.table(
            {
                "doc_id": pa.array(ids[r[starts]], pa.int64()),
                "n_feats": pa.array(np.add.reduceat(c, starts)),
                # per-term products stay far inside int64: |lam| < 2^46,
                # per-doc occurrence totals ~1e3-1e6
                "logw_q": pa.array(np.add.reduceat(c * lam[b], starts)),
            }
        )

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        lw = batch.column("logw_q").combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.lexsort((ids, -lw))[:k]
        return batch.take(pa.array(np.sort(keep)))

    return (
        raw.map_batches(score, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
        .sort(["logw_q", "doc_id"], descending=[True, False])
        .limit(k)
    )
