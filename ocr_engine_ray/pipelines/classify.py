"""Multinomial Naive-Bayes source classifier (fastText-style quality/routing
classifier, the simplest member of the classifier-filter family used by
web-scale curation pipelines, e.g. CCNet's target-domain LM filter or the
GPT-3 quality classifier — trained and applied in one engine pass here).

Train: per-source token counts with Laplace smoothing over the corpus
vocabulary.  Apply: classify every document to ``argmax_s [ Σ_t c_dt ·
ln P(t|s) + ln P(s) ]`` and report the source×prediction confusion matrix.

Distributed shape (no vocabulary-sized driver state — the weakness the
round-3 tf-idf rewrite removed):

1. one tokenize pass emits per-batch ``(doc, source, token, count)``
   partials plus a per-doc spine ``(doc, true-source, n_tokens)``;
2. ONE token-bucket shuffle: each bucket holds every occurrence row of its
   tokens, so it finalizes the per-(token, source) counts ``c_ts``, their
   quantized log-likelihoods (a dense (ntok, S) LUT — the model shard),
   and each doc's partial score against every source via S vectorized
   multiply+reduceat passes over the doc-sorted occurrences (peak memory
   O(occurrences), never O(occurrences × S)); partials leave the bucket
   PACKED as one row per doc carrying S score columns — an S× row cut on
   both shuffles (measured 1074 s → see BENCH/BASELINE.md at 1M docs ×
   20 sources for the unpacked version's cost);
3. per-source totals (``n_s``, vocabulary size) leave the buckets as
   S-sized stat rows; the only driver state is S log-constants;
4. one doc-bucket shuffle folds the per-(doc, source) partials, applies the
   per-source constants, and takes the argmax (ties break to the lexically
   smallest source, matching the SQL twin's ``ORDER BY score DESC, cand``).

All score arithmetic is exact int64 on the quantized-ln grid
(``round_even(ln(x) · 2^40)`` — DuckDB ``ln`` == numpy ``log`` and
``round_even`` == ``np.round`` bit-for-bit, the same contract as
`lm.bigram_logprob_score` / `dsir.dsir_select`), so the confusion matrix is
bit-identical to the wholesale SQL recompute at any batching or arrival
order.  Overflow bound: ``n_d · ln(n_s + V) · 2^40`` stays under 2^63 for
docs up to ~2·10^5 tokens even at web-scale counts (ln ≈ 30).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.tokenize import WS_SPLIT, explode_tokens
from ..sources.tables import sf_table

_SCALE = 1099511627776.0  # 2^40, the repo's quantized-ln grid

# row kinds in the unified shuffle table
_K_PART = 0  # (doc_id, src, val=Σ c·l1) partial score
_K_NS = 1  # (src, val=Σ c_ts) per-source token-total partial
_K_SPINE = 2  # (doc_id, src=true source, val=n_d) doc spine
_K_VOCAB = 3  # (val=distinct tokens in bucket) vocabulary partial


def _qln(x: np.ndarray | float) -> np.ndarray:
    """round_even(ln(x) * 2^40) as int64 — the exact-twin quantizer."""
    return np.round(np.log(x) * _SCALE).astype(np.int64)


def nb_source_classify(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Train + apply the NB source classifier; returns the confusion matrix
    ``(source, pred_source, n_docs)`` (S² rows, the legitimately small
    result).  Exact SQL twin in ``__ray_entry__.oracle_sql()``."""
    # -- step 0: the source universe (S-sized; column-pruned scan) ----------
    src_rows = [
        r
        for r in sf_table(sf_dir, "documents", columns=["source"])
        .groupby("source")
        .count()
        .take_all()
        if r["source"] is not None
    ]
    names = sorted(r["source"] for r in src_rows)
    S = len(names)
    idx_of = {s: i for i, s in enumerate(names)}
    d_s = np.array([next(r["count()"] for r in src_rows if r["source"] == n) for n in names], np.int64)
    d_tot = int(d_s.sum())

    B = num_buckets

    # -- step 1: tokenize once; emit occurrence partials + the doc spine ----
    def tokenize_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        keep = np.array([s is not None for s in srcs], dtype=bool)
        ids = ids[keep].astype(np.int64)
        src_idx = np.array([idx_of[s] for s, k in zip(srcs, keep) if k], np.int64)
        texts = [t for t, k in zip(texts, keep) if k]
        n = len(texts)

        rows, codes, dic = explode_tokens(texts, pattern=WS_SPLIT, lower=False)
        ndic = max(1, len(dic))
        ukey, ucnt = np.unique(rows * ndic + codes, return_counts=True)
        urow, ucode = ukey // ndic, ukey % ndic
        dic_py = dic.to_pylist()
        dic_bkt = np.array([zlib.crc32(t.encode()) % B for t in dic_py], np.int64)
        n_d = np.bincount(rows, minlength=n).astype(np.int64) if n else np.empty(0, np.int64)

        m = len(ukey)
        kind = np.concatenate([np.full(m, _K_PART, np.int64), np.full(n, _K_SPINE, np.int64)])
        bkt = np.concatenate([dic_bkt[ucode], ids % B])
        doc = np.concatenate([ids[urow], ids])
        src = np.concatenate([src_idx[urow], src_idx])
        val = np.concatenate([ucnt.astype(np.int64), n_d])
        tok = pa.concat_arrays(
            [pa.array(dic_py, pa.string()).take(pa.array(ucode, pa.int64())), pa.nulls(n, pa.string())]
        )
        return pa.table(
            {
                "kind": pa.array(kind, pa.int64()),
                "bkt": pa.array(bkt, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "src": pa.array(src, pa.int64()),
                "tok": tok,
                "val": pa.array(val, pa.int64()),
            }
        )

    # -- step 2: token buckets finalize their model shard + doc partials ----
    def bucket_kernel(group: pa.Table) -> pa.Table:
        kind = group.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
        is_tok = kind == _K_PART
        out_k, out_d, out_s, out_v = [], [], [], []

        vecs: np.ndarray | None = None
        if is_tok.any():
            g = group.filter(pa.array(is_tok))
            enc = pc.dictionary_encode(g.column("tok").combine_chunks())
            tcode = np.asarray(enc.indices, dtype=np.int64)
            ntok = len(enc.dictionary)
            src = g.column("src").combine_chunks().to_numpy(zero_copy_only=False)
            doc = g.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
            c = g.column("val").combine_chunks().to_numpy(zero_copy_only=False)

            # c_ts: exact counts per (token, source) via sort + reduceat
            ts_key = tcode * S + src
            order = np.argsort(ts_key, kind="stable")
            sk = ts_key[order]
            starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
            c_ts = np.add.reduceat(c[order], starts)
            l1 = _qln((c_ts + 1).astype(np.float64))

            # model shard as a dense (ntok, S) int64 LUT — unseen (t, s)
            # pairs keep l1 = qln(1) = 0, so the cross-source fold below is
            # exactly "every occurrence scores against every candidate"
            # without materializing an S× expansion.
            lut = np.zeros((ntok, S), np.int64)
            lut[sk[starts] // S, sk[starts] % S] = l1

            # per-(doc, ·) partial: ONE sort by doc, then S vectorized
            # multiply+reduceat passes (peak memory O(occurrences), not
            # O(occurrences × S)); the partials leave the bucket PACKED as
            # one fixed-size-list row per doc — an S× shuffle-row cut.
            od = np.argsort(doc, kind="stable")
            doc_s, tc_s, c_s = doc[od], tcode[od], c[od]
            dst = np.flatnonzero(np.r_[True, doc_s[1:] != doc_s[:-1]])
            docs_u = doc_s[dst]
            part = np.empty((len(dst), S), np.int64)
            for s in range(S):
                part[:, s] = np.add.reduceat(c_s * lut[tc_s, s], dst)

            out_k.append(np.full(len(dst), _K_PART, np.int64))
            out_d.append(docs_u)
            out_s.append(np.full(len(dst), -1, np.int64))
            out_v.append(np.zeros(len(dst), np.int64))
            vecs = part

            # per-source token totals + vocabulary partial of this bucket
            n_s = np.zeros(S, np.int64)
            np.add.at(n_s, sk[starts] % S, c_ts)
            nz = np.flatnonzero(n_s)
            out_k.append(np.full(len(nz), _K_NS, np.int64))
            out_d.append(np.full(len(nz), -1, np.int64))
            out_s.append(nz)
            out_v.append(n_s[nz])
            out_k.append(np.array([_K_VOCAB], np.int64))
            out_d.append(np.array([-1], np.int64))
            out_s.append(np.array([-1], np.int64))
            out_v.append(np.array([ntok], np.int64))

        if (~is_tok).any():
            g = group.filter(pa.array(~is_tok))
            out_k.append(np.full(g.num_rows, _K_SPINE, np.int64))
            out_d.append(g.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False))
            out_s.append(g.column("src").combine_chunks().to_numpy(zero_copy_only=False))
            out_v.append(g.column("val").combine_chunks().to_numpy(zero_copy_only=False))

        kind_a = np.concatenate(out_k) if out_k else np.empty(0, np.int64)
        n_out = len(kind_a)
        # packed score columns p0..p{S-1}: the partial block leads (it is
        # appended first), every other row carries zeros (additive identity)
        pmat = np.zeros((n_out, S), np.int64)
        if vecs is not None:
            pmat[: len(vecs)] = vecs
        cols = {
            "kind": pa.array(kind_a),
            "doc_id": pa.array(np.concatenate(out_d) if out_d else np.empty(0, np.int64)),
            "src": pa.array(np.concatenate(out_s) if out_s else np.empty(0, np.int64)),
            "val": pa.array(np.concatenate(out_v) if out_v else np.empty(0, np.int64)),
        }
        for s in range(S):
            cols[f"p{s}"] = pa.array(pmat[:, s])
        return pa.table(cols)

    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    mat = (
        docs.map_batches(tokenize_batch, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(bucket_kernel, batch_format="pyarrow")
        .materialize()
    )

    def _keep_kinds(*kinds: int):
        kset = pa.array(list(kinds), pa.int64())

        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch.column("kind"), value_set=kset))

        return f

    # -- step 3: S-sized constants to the driver ----------------------------
    stats = mat.map_batches(
        _keep_kinds(_K_NS, _K_VOCAB), batch_format="pyarrow"
    ).take_all()
    n_s = np.zeros(S, np.int64)
    vocab = 0
    for r in stats:
        if r["kind"] == _K_NS:
            n_s[r["src"]] += r["val"]
        else:
            vocab += r["val"]
    l2 = _qln((n_s + vocab).astype(np.float64))
    pr = _qln(d_s.astype(np.float64) / float(d_tot))

    # -- step 4: doc-bucket fold + argmax + confusion partials ---------------
    def argmax_kernel(group: pa.Table) -> pa.Table:
        kind = group.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
        doc = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        src = group.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        val = group.column("val").combine_chunks().to_numpy(zero_copy_only=False)
        sp = kind == _K_SPINE
        sdoc, strue, snd = doc[sp], src[sp], val[sp]
        if len(sdoc) == 0:
            return pa.table(
                {"t": pa.array([], pa.int64()), "p": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        order = np.argsort(sdoc, kind="stable")
        sdoc, strue, snd = sdoc[order], strue[order], snd[order]
        # scores start at the doc-independent terms: PR(s) - n_d · L2(s)
        scores = pr[None, :] - snd[:, None] * l2[None, :]
        pm = np.stack(
            [
                group.column(f"p{s}").combine_chunks().to_numpy(zero_copy_only=False)
                for s in range(S)
            ],
            axis=1,
        )[~sp]
        drow = np.searchsorted(sdoc, doc[~sp])
        np.add.at(scores, drow, pm)
        pred = np.argmax(scores, axis=1)  # first max == lexically smallest
        conf = np.bincount(strue * S + pred, minlength=S * S)
        nz = np.flatnonzero(conf)
        return pa.table(
            {
                "t": pa.array(nz // S, pa.int64()),
                "p": pa.array(nz % S, pa.int64()),
                "n": pa.array(conf[nz], pa.int64()),
            }
        )

    def to_doc_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.is_in(
                batch.column("kind"), value_set=pa.array([_K_PART, _K_SPINE], pa.int64())
            )
        )
        d = batch.column("doc_id")  # non-negative, so trunc-div == floor-div
        bkt2 = pc.subtract(d, pc.multiply(pc.divide(d, B), B))
        return batch.append_column("bkt2", pc.cast(bkt2, pa.int64()))

    partials = (
        mat.map_batches(to_doc_bucket, batch_format="pyarrow")
        .groupby("bkt2")
        .map_groups(argmax_kernel, batch_format="pyarrow")
        .take_all()
    )  # ≤ S²·B tiny confusion partials

    conf = np.zeros(S * S, np.int64)
    for r in partials:
        conf[r["t"] * S + r["p"]] += r["n"]
    nz = np.flatnonzero(conf)
    out = pa.table(
        {
            "source": pa.array([names[k // S] for k in nz], pa.string()),
            "pred_source": pa.array([names[k % S] for k in nz], pa.string()),
            "n_docs": pa.array(conf[nz], pa.int64()),
        }
    )
    return rd.from_arrow(out)
