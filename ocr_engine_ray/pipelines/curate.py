"""End-to-end corpus curation — the composition a training-data user
actually runs: quality filter → exact dedup (keep first) → per-source
yield stats.  One streaming chain, one shuffle (the dedup bucket groupby).

Every stage is individually oracle-gated elsewhere (doc_stats quality,
exact_dedup, token counts); this pipeline proves the *composition* is also
exact: the DuckDB twin is a WHERE quality ≥ t → row_number-over-text → GROUP
BY source query.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions import textstats as ts
from ..sources.tables import sf_table

NUM_CURATE_BUCKETS = 64


def _quality_sha_batch(batch: pa.Table, *, min_quality: float) -> pa.Table:
    """Filter by quality score, then attach dedup keys + token counts."""
    from .textstats import quality_scores_batch

    texts = batch.column("text").to_pylist()
    q = np.array(quality_scores_batch(texts))
    keep = q >= min_quality
    t = batch.filter(pa.array(keep))
    kept_texts = [x for x, k in zip(texts, keep) if k]
    sha = [hashlib.sha1((x or "").encode("utf-8")).hexdigest() for x in kept_texts]
    bucket = [int(x[:8], 16) % NUM_CURATE_BUCKETS for x in sha]
    # Token = RE2 '\S+' run (pyarrow's regex kernels are RE2-backed), the
    # exact tokenizer of the oracle's _TOK — NOT Python str.split(), whose
    # Unicode whitespace class drifts from SQL on \v / NBSP etc.
    ntok = pc.count_substring_regex(t.column("text"), r"\S+").cast(pa.int64())
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "text_sha1": pa.array(sha, pa.string()),
            "bucket": pa.array(bucket, pa.int32()),
            "n_tokens": ntok,
        }
    )


def _keep_first(group: pa.Table) -> pa.Table:
    import pandas as pd

    df = group.select(["doc_id", "source", "text_sha1", "n_tokens"]).to_pandas()
    df = df.sort_values("doc_id").drop_duplicates("text_sha1", keep="first")
    return pa.Table.from_pandas(
        df[["source", "n_tokens"]], preserve_index=False
    )


def curate_corpus(sf_dir: str, *, min_quality: float = 0.8) -> rd.Dataset:
    """(source, n_docs, total_tokens) of the curated corpus: documents with
    quality ≥ ``min_quality``, exact-deduplicated keep-first-by-doc_id."""
    from ray.data.aggregate import Count, Sum

    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    survivors = ds.map_batches(
        _quality_sha_batch,
        batch_format="pyarrow",
        fn_kwargs={"min_quality": min_quality},
    )
    deduped = survivors.groupby("bucket").map_groups(
        _keep_first, batch_format="pyarrow"
    )
    agg = deduped.groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("n_tokens", alias_name="total_tokens")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch.column("source"),
                "n_docs": batch.column("n_docs"),
                "total_tokens": pc.cast(batch.column("total_tokens"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Full training-mix composition (the round-3 hygiene + packing stack, fused)
# ---------------------------------------------------------------------------


def curate_training_mix(
    sf_dir: str,
    *,
    bench_source: str = "src0",
    max_dup_line_frac: float = 0.30,
    max_top_word_frac: float = 0.20,
    alpha: float = 0.5,
    budget: int = 512,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """The one-call training-data recipe a user of this engine runs:

    1. drop repetition-flagged docs (Gopher dup-line / top-word signals);
    2. drop benchmark docs AND train docs sharing any word 8-gram with the
       benchmark (decontamination);
    3. CCNet normalize-then-hash exact dedup (keep-first by doc_id);
    4. temperature source rebalancing over the SURVIVORS' token mass
       ((tok_s/tok_min)^(alpha-1) hash-coin per doc);
    5. pack the final mix into fixed-budget training sequences
       (two-pass distributed prefix sum).

    Fusion shape: steps 1-3's per-doc work (flags, gram membership,
    normalized sha1) happens in ONE ``map_batches`` pass after the tiny
    benchmark-gram broadcast; the only corpus shuffles are the dedup bucket
    groupby and the packing bucket groupby — everything between is
    sources × buckets scalars through ``ray.put``.  Exact-SQL-gated by a
    composed CTE twin that chains the five operators' individual oracles.

    Returns (doc_id, source, n_tokens, tok_offset, seq_id), sorted.
    """
    import hashlib as _hl

    import numpy as np
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from ..sources.tables import sf_table
    from .decontam import bench_gram_ref, gram_rows_batch

    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    bench_ref = bench_gram_ref(docs, bench_source=bench_source)

    def hygiene(batch: pa.Table) -> pa.Table:
        """Steps 1-3 per-doc work in one pass: repetition flags, benchmark
        gram membership, CCNet-normalized sha1 + dedup bucket.  The
        line/word repetition counts come from the batch-vectorized
        `line_word_stats_batch` (value-identical to the historical per-doc
        split/Counter loop); only the gram hashing and sha1 remain per-doc."""
        from ..functions.tokenize import WORD_SPLIT, explode_tokens
        from .decontam import line_word_stats_batch

        bset = ray.get(bench_ref)
        t = pc.fill_null(batch.column("text"), "")
        norm = pc.utf8_lower(t)
        norm = pc.replace_substring_regex(norm, r"[^\w \t\n\f\r]+", "")
        norm = pc.replace_substring_regex(norm, r"[ \t\n\f\r]+", " ")
        norm = pc.utf8_trim(norm, " ")
        ntok = pc.count_substring_regex(t, r"\S+").cast(pa.int64())
        texts = t.to_pylist()
        # one word tokenization per batch, shared by the repetition stats
        # and the gram hashing
        occ = explode_tokens(texts, pattern=WORD_SPLIT, lower=True)
        nl, nu, nw, tc = line_word_stats_batch(texts, word_occ=occ)
        grows, ghash, _ = gram_rows_batch(texts, occ=occ)
        contam = np.zeros(len(texts), dtype=bool)
        if len(ghash):
            contam[grows[np.isin(ghash, bset)]] = True
        keep, sha, bucket = [], [], []
        for i, (nrm, l, u, w_, c) in enumerate(
            zip(norm.to_pylist(), nl.tolist(), nu.tolist(), nw.tolist(), tc.tolist())
        ):
            dup = round((l - u) / l, 6)
            top = round(c / w_, 6) if w_ else 0.0
            keep.append(
                dup <= max_dup_line_frac
                and top <= max_top_word_frac
                and not bool(contam[i])
            )
            h = _hl.sha1(nrm.encode("utf-8")).hexdigest()
            sha.append(h)
            bucket.append(int(h[:8], 16) % NUM_CURATE_BUCKETS)
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "n_tokens": ntok,
                "text_sha1": pa.array(sha, pa.string()),
                "bucket": pa.array(bucket, pa.int32()),
            }
        )
        mask = pa.array(keep)
        return out.filter(mask)

    train = docs.filter(expr=f"source != '{bench_source}'")
    survivors = train.map_batches(hygiene, batch_format="pyarrow")

    def keep_first(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F401

        df = group.select(["doc_id", "source", "n_tokens", "text_sha1"]).to_pandas()
        df = df.sort_values("doc_id").drop_duplicates("text_sha1", keep="first")
        return pa.Table.from_pandas(
            df[["doc_id", "source", "n_tokens"]], preserve_index=False
        )

    deduped = survivors.groupby("bucket").map_groups(
        keep_first, batch_format="pyarrow"
    ).materialize()

    # step 4: temperature rebalance over the survivors' token mass.  The
    # same pass also carries per-source Min/Max(doc_id): packing's range
    # buckets only need SOME monotone-in-doc_id covering split, so bounds
    # from the pre-coin survivors are as good as bounds from the mix —
    # and computing them here saves a dedicated full scan of the mix.
    parts = (
        deduped.groupby("source")
        .aggregate(
            Sum("n_tokens", alias_name="w_s"),
            Min("doc_id", alias_name="id_lo"),
            Max("doc_id", alias_name="id_hi"),
        )
        .take_all()
    )
    if not parts:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "n_tokens": pa.array([], pa.int64()),
                    "tok_offset": pa.array([], pa.int64()),
                    "seq_id": pa.array([], pa.int64()),
                }
            )
        )
    from .sampling import source_keep_probs, temperature_coin

    p_ref = ray.put(source_keep_probs(parts, alpha))

    def coin(batch: pa.Table) -> pa.Table:
        p = ray.get(p_ref)
        srcs = batch.column("source").to_pylist()
        u = temperature_coin(batch.column("doc_id").to_pylist())
        thr = np.array([p[s] for s in srcs])
        return batch.filter(pa.array(u < thr))

    # step 5: pack into sequences (two-pass prefix sum over doc_id ranges).
    # The coin filter and the range bucketing fuse into one pass over the
    # survivors; no intermediate mix materialization.  lo/hi came with the
    # rebalance aggregate above (coin only removes rows, and the min-weight
    # source's keep-probability is exactly 1, so the mix is non-empty and
    # covered whenever the survivors are).
    lo = min(r["id_lo"] for r in parts)
    hi = max(r["id_hi"] for r in parts)
    span = max(1, hi - lo + 1)

    def range_bucket(batch: pa.Table) -> pa.Table:
        import numpy as _np

        ids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        bkt = ((ids - lo).astype(_np.float64) * num_buckets / span).astype(_np.int64)
        _np.clip(bkt, 0, num_buckets - 1, out=bkt)
        return batch.append_column("rbkt", pa.array(bkt))

    tok = (
        deduped.map_batches(coin, batch_format="pyarrow")
        .map_batches(range_bucket, batch_format="pyarrow")
        .materialize()
    )
    from .packing import pack_token_stream

    return pack_token_stream(tok, budget=budget, bucket_col="rbkt")
