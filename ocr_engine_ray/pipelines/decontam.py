"""Benchmark decontamination + repetition-quality flags — the two corpus
hygiene passes a training-data pipeline runs beside dedup.

`decontaminate` is the standard eval-leakage scrub (n-gram overlap against a
held-out benchmark, as in GPT-3 / PaLM data cards): the benchmark's word
8-gram set is the SMALL side, aggregated once and broadcast via ``ray.put``;
the corpus is scanned in one streaming ``map_batches`` pass with a
vectorized membership test per doc — no shuffle at all.  At 10^12-doc scale
the benchmark set stays driver-buildable (eval suites are ~10^5 grams); if
a giant benchmark ever exceeded worker heap the broadcast would become an
``IntBloom`` (false positives → over-flagging only), same trade as the
MinHash candidate prune.

`repetition_flags` computes the Gopher-style repetitiousness signals
(duplicate-line fraction, top-word fraction) per doc — pure per-batch map,
no shuffle.

Both are exact-SQL-gated (the DuckDB twins recompute the n-grams with
``list_slice`` over ``regexp_extract_all`` and the line stats with
``string_split``).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..sources.tables import sf_table

# ASCII word class == RE2/DuckDB `\w` (Python's `\w` is Unicode-wide);
# see pipelines/dedup.py for the rationale.
_WORD_RE = re.compile(r"[0-9A-Za-z_]+")

BENCH_SOURCE = "src0"  # the synthetic corpus's stand-in for the eval suite
NGRAM = 8


def _gram_hashes(text: str, n: int = NGRAM) -> np.ndarray:
    """Distinct word n-grams of a doc as 64-bit blake2b hashes, reinterpreted
    as int64 (bijective view — Arrow-native, equality-preserving)."""
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < n:
        return np.empty(0, dtype=np.int64)
    grams = {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
            for g in grams
        ),
        dtype=np.uint64,
        count=len(grams),
    ).view(np.int64)


def bench_gram_ref(
    docs: rd.Dataset, *, bench_source: str = BENCH_SOURCE, n: int = NGRAM
) -> "ray.ObjectRef":
    """Aggregate the benchmark's distinct gram hashes on-cluster and
    broadcast them once (``ray.put`` of a sorted int64 array; empty array
    when the benchmark has no grams).  The benchmark gram set is the small
    side by construction.  Shared by `decontaminate` and
    `curate.curate_training_mix` so the contamination definition cannot
    drift between the two gated surfaces.  ``docs`` must carry
    (text, source) columns."""
    bench = docs.filter(expr=f"source == '{bench_source}'")

    def bench_grams(batch: pa.Table) -> pa.Table:
        hs = [_gram_hashes(t, n) for t in batch.column("text").to_pylist()]
        u = np.unique(np.concatenate(hs)) if hs else np.empty(0, np.int64)
        return pa.table({"h": pa.array(u)})

    gram_rows = bench.map_batches(bench_grams, batch_format="pyarrow").unique("h") or []
    return ray.put(np.array(sorted(gram_rows), dtype=np.int64))


def decontaminate(
    sf_dir: str, *, bench_source: str = BENCH_SOURCE, n: int = NGRAM
) -> rd.Dataset:
    """Per-training-doc benchmark-overlap counts: for every doc NOT in
    ``bench_source``, the number of its distinct word ``n``-grams that also
    occur anywhere in the ``bench_source`` docs, plus the contaminated flag.

    Returns (doc_id, n_gram_hits, contaminated), sorted by doc_id.  Gram
    identity is by 64-bit hash on the Ray side (the scale representation)
    vs raw strings in the SQL twin — a disagreement needs a blake2b-64
    collision inside one benchmark (~1e-13 at 10^5 grams).
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    bench_ref = bench_gram_ref(docs, bench_source=bench_source, n=n)
    train = docs.filter(expr=f"source != '{bench_source}'")

    def hits(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        ids = batch.column("doc_id")
        counts = np.empty(batch.num_rows, dtype=np.int64)
        for i, t in enumerate(batch.column("text").to_pylist()):
            gh = _gram_hashes(t, n)
            counts[i] = int(np.isin(gh, bset).sum()) if len(gh) else 0
        return pa.table(
            {
                "doc_id": ids,
                "n_gram_hits": pa.array(counts),
                "contaminated": pa.array(counts > 0),
            }
        )

    return train.map_batches(hits, batch_format="pyarrow").sort("doc_id")


def repetition_flags(
    sf_dir: str, *, max_dup_line_frac: float = 0.30, max_top_word_frac: float = 0.20
) -> rd.Dataset:
    """Gopher-style repetitiousness signals per doc (Rae et al. 2021 §A1.1):
    the fraction of lines that duplicate an earlier line, and the share of
    the most frequent word.  ``flagged`` marks docs over either threshold.

    Returns (doc_id, dup_line_frac, top_word_frac, flagged) sorted by
    doc_id; fractions round-half-even to 6 places so the distributed floats
    are bit-equal to the DuckDB twin's ``round_even`` recomputation.
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        dup, top, flag = [], [], []
        for t in batch.column("text").to_pylist():
            t = t or ""
            lines = t.split("\n")
            d = round((len(lines) - len(set(lines))) / len(lines), 6)
            words = _WORD_RE.findall(t.lower())
            w = round(Counter(words).most_common(1)[0][1] / len(words), 6) if words else 0.0
            dup.append(d)
            top.append(w)
            flag.append(d > max_dup_line_frac or w > max_top_word_frac)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "dup_line_frac": pa.array(dup, pa.float64()),
                "top_word_frac": pa.array(top, pa.float64()),
                "flagged": pa.array(flag),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow").sort("doc_id")


def _gram_hashes_all(text: str, n: int = NGRAM) -> np.ndarray:
    """ALL word n-gram positions of a doc (not deduped) as 64-bit blake2b
    int64 views — the positional variant of `_gram_hashes`."""
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < n:
        return np.empty(0, dtype=np.int64)
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
            for g in grams
        ),
        dtype=np.uint64,
        count=len(grams),
    ).view(np.int64)


def duplicate_ngram_spans(
    sf_dir: str, *, n: int = NGRAM, min_docs: int = 2
) -> rd.Dataset:
    """Cross-document duplicated n-gram detection — the positional signal
    behind exact-substring dedup (Lee et al. 2022): for every doc, how many
    of its word ``n``-gram positions carry a gram that also occurs in at
    least ``min_docs`` distinct documents (boilerplate/licence spans,
    copy-pasted passages).

    Scale shape: one map pass pre-aggregates (gram, doc) position counts
    inside each batch (map-side combine), ONE gram-keyed shuffle computes
    each gram's distinct-doc count and re-emits the per-doc counts of
    qualifying grams, and a doc-keyed aggregate sums them.  The shuffle
    carries one row per distinct (gram, doc) — the same volume the
    suffix-array approach's sort would move, expressed as a groupby.

    Returns (doc_id, n_dup_positions) for docs with ≥1 duplicated
    position, sorted.  Gram identity is by 64-bit hash on the Ray side vs
    raw strings in the SQL twin (same collision argument as
    `decontaminate`).
    """
    from ray.data.aggregate import Sum

    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def gram_doc_counts(batch: pa.Table) -> pa.Table:
        g_out: list[np.ndarray] = []
        d_out: list[np.ndarray] = []
        c_out: list[np.ndarray] = []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            gh = _gram_hashes_all(t, n)
            if not len(gh):
                continue
            uniq, counts = np.unique(gh, return_counts=True)
            g_out.append(uniq)
            d_out.append(np.full(len(uniq), d, dtype=np.int64))
            c_out.append(counts.astype(np.int64))
        if not g_out:
            return pa.table(
                {
                    "gram": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_pos": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "gram": pa.array(np.concatenate(g_out), pa.int64()),
                "doc_id": pa.array(np.concatenate(d_out), pa.int64()),
                "n_pos": pa.array(np.concatenate(c_out), pa.int64()),
            }
        )

    def dup_grams(group: pa.Table) -> pa.Table:
        """One gram's (doc, n_pos) rows → the same rows iff the gram spans
        ≥ min_docs distinct docs, else nothing.  Runs per gram-hash group;
        vectorized run detection over the whole group block."""
        g = group.column("gram").combine_chunks().to_numpy(zero_copy_only=False)
        d = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        c = group.column("n_pos").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((d, g))
        g, d, c = g[order], d[order], c[order]
        new = np.concatenate([[True], g[1:] != g[:-1]]) if len(g) else np.array([], bool)
        starts = np.nonzero(new)[0]
        ends = np.concatenate([starts[1:], [len(g)]]) if len(starts) else starts
        # (gram, doc) rows are distinct per doc by construction, so the run
        # length IS the distinct-doc count; expand the per-run verdict back
        # to rows with one repeat — no per-run Python.
        lens = ends - starts
        keep = (
            np.repeat(lens >= min_docs, lens)
            if len(lens)
            else np.zeros(0, dtype=bool)
        )
        return pa.table(
            {
                "doc_id": pa.array(d[keep], pa.int64()),
                "n_pos": pa.array(c[keep], pa.int64()),
            }
        )

    # Coarse-bucket the gram groupby (the tiny-groups lesson from MinHash):
    # group on gram % B and process all gram runs of a bucket in one call.
    def add_cb(batch: pa.Table) -> pa.Table:
        g = batch.column("gram").combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column(
            "cb", pa.array((g % 256).astype(np.int32))
        )

    pairs = (
        docs.map_batches(gram_doc_counts, batch_format="pyarrow")
        .map_batches(add_cb, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(dup_grams, batch_format="pyarrow")
    )
    return (
        pairs.groupby("doc_id")
        .aggregate(Sum("n_pos", alias_name="n_dup_positions"))
        .sort("doc_id")
    )
