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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..sources.tables import sf_table

# ASCII word class == RE2/DuckDB `\w` (Python's `\w` is Unicode-wide);
# see pipelines/dedup.py for the rationale.
_WORD_RE = re.compile(r"[0-9A-Za-z_]+")

BENCH_SOURCE = "src0"  # the synthetic corpus's stand-in for the eval suite
NGRAM = 8


def line_word_stats_batch(
    texts: list[str | None],
    *,
    word_occ: tuple[np.ndarray, np.ndarray, pa.Array] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch repetition counts, value-identical to the per-doc
    split/Counter path (property-tested in tests/test_decontam.py):
    returns int64 arrays ``(n_lines, n_uniq_lines, n_words,
    top_word_count)`` per text.  Callers apply Python ``round()`` to the
    ratios so the 6-dp half-even decimals stay bit-equal to the DuckDB
    twins (np.round's scale-and-rint shortcut is NOT correctly-rounded
    decimal rounding).

    Hot path is Arrow/numpy end to end: ONE ``split_pattern`` /
    ``split_pattern_regex`` + ``dictionary_encode`` per batch (C speed),
    then ``np.unique`` over (row, code) pairs for per-row distinct counts
    and max multiplicities — no per-doc Counter, no per-token Python.
    The word split (RE2 ``[^0-9A-Za-z_]+`` + empty-string drop) is exactly
    ``_WORD_RE.findall`` (verified: splitting on non-word runs yields the
    word runs plus '' at the edges); lowercase happens in Python
    ``str.lower`` so exotic-Unicode case folding cannot drift from the
    historical per-doc loop.

    ``word_occ``: optional precomputed ``explode_tokens(texts,
    pattern=WORD_SPLIT, lower=True)`` triple — pass it when the caller
    (curate's hygiene) also gram-hashes the same batch, so the word
    tokenization runs once, not twice."""
    import pyarrow.compute as _pc

    from ..functions.tokenize import WORD_SPLIT, explode_tokens

    n = len(texts)
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z.copy(), z.copy(), z.copy()

    def per_row_stats(
        rows: np.ndarray, codes: np.ndarray, total: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if len(rows) == 0:
            return total, np.zeros(n, np.int64), np.zeros(n, np.int64)
        ncodes = int(codes.max()) + 1
        ucomb, ucounts = np.unique(rows * ncodes + codes, return_counts=True)
        urows = ucomb // ncodes
        uniq = np.bincount(urows, minlength=n).astype(np.int64)
        starts = np.nonzero(np.concatenate([[True], urows[1:] != urows[:-1]]))[0]
        maxc = np.zeros(n, np.int64)
        maxc[urows[starts]] = np.maximum.reduceat(ucounts, starts)
        return total, uniq, maxc

    # lines: plain split on "\n", '' elements kept ("".split("\n") == [""])
    orig = pa.array([(t or "") for t in texts], pa.string())
    line_list = _pc.split_pattern(orig, "\n")
    line_lens = np.asarray(_pc.list_value_length(line_list), dtype=np.int64)
    line_rows = np.repeat(np.arange(n, dtype=np.int64), line_lens)
    line_codes = np.asarray(
        _pc.dictionary_encode(_pc.list_flatten(line_list)).indices, dtype=np.int64
    )
    n_lines, n_uniq_lines, _ = per_row_stats(line_rows, line_codes, line_lens)

    wrows, wcodes, _wdic = word_occ if word_occ is not None else explode_tokens(
        texts, pattern=WORD_SPLIT, lower=True
    )
    n_words = np.bincount(wrows, minlength=n).astype(np.int64)
    _, _, top_count = per_row_stats(wrows, wcodes, n_words)
    return n_lines, n_uniq_lines, n_words, top_count


# Vectorized gram identity: blake2b per DISTINCT word (cached per batch via
# dictionary_encode), then one polynomial mix over each n-window of word
# hashes — G = Σ_k wh[i+k]·M^k in uint64 wraparound arithmetic.  Gram-hash
# VALUES never surface in any gated output (only membership counts and
# flags), so the identity function may differ from the per-doc blake2b
# string hash as long as every consumer (bench_gram_ref, decontaminate,
# curate hygiene, duplicate_ngram_spans) uses the same one and it stays
# injective w.h.p. on the realized gram sets (~2^-64 per pair for
# blake2b-uniform word hashes; ≤1e-6 corpus-wide at bench scale).
_GRAM_MULT = np.uint64(0x9E3779B97F4A7C15)
_GRAM_POWS: dict[int, np.ndarray] = {}


def _gram_pows(n: int) -> np.ndarray:
    p = _GRAM_POWS.get(n)
    if p is None:
        p = np.empty(n, dtype=np.uint64)
        p[0] = 1
        for k in range(1, n):
            p[k] = p[k - 1] * _GRAM_MULT  # uint64 wraparound
        _GRAM_POWS[n] = p
    return p


def gram_rows_batch(
    texts: list[str | None],
    n: int = NGRAM,
    *,
    occ: "tuple[np.ndarray, np.ndarray, pa.Array] | None" = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All DISTINCT word ``n``-grams of a batch as ``(row_idx, gram_hash,
    n_positions)`` int64 arrays, sorted by (row, hash) — the batched,
    vectorized replacement for per-doc `_gram_hashes` /
    `_gram_hashes_all` loops (gram-set equivalence property-tested
    against them in tests/test_decontam.py).

    Hot path: ONE RE2 word split + ``dictionary_encode`` per batch, ONE
    blake2b per distinct word (words repeat heavily across docs), then
    ``n`` vectorized multiply-adds for the window mix and a lexsort for
    per-row dedup — no per-doc Python, no per-gram string join/hash.

    ``occ``: optional precomputed ``explode_tokens(texts,
    pattern=WORD_SPLIT, lower=True)`` triple — pass it when the caller
    (curate's hygiene) also computes repetition stats on the same batch,
    so the word tokenization runs once, not twice."""
    from ..functions.tokenize import WORD_SPLIT, explode_tokens

    m = len(texts)
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    if m == 0:
        return empty
    rows, codes, dic = occ if occ is not None else explode_tokens(
        texts, pattern=WORD_SPLIT, lower=True
    )
    total = len(codes)
    if total < n:
        return empty
    dict_words = dic.to_pylist()
    wh = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            for w in dict_words
        ),
        dtype=np.uint64,
        count=len(dict_words),
    )
    x = wh[codes]
    w_cnt = total - n + 1
    pows = _gram_pows(n)
    g = np.zeros(w_cnt, dtype=np.uint64)
    for k in range(n):
        g += x[k : w_cnt + k] * pows[k]
    # a window is a real gram iff it does not cross a doc boundary
    valid = rows[:w_cnt] == rows[n - 1 :]
    grows, g = rows[:w_cnt][valid], g[valid]
    if len(g) == 0:
        return empty
    order = np.lexsort((g, grows))
    r, gs = grows[order], g[order]
    first = np.concatenate([[True], (r[1:] != r[:-1]) | (gs[1:] != gs[:-1])])
    idx = np.nonzero(first)[0]
    counts = np.diff(np.concatenate([idx, [len(r)]]))
    return r[idx], gs[idx].view(np.int64), counts.astype(np.int64)


def _gram_hashes(text: str, n: int = NGRAM) -> np.ndarray:
    """Distinct word n-grams of a doc as 64-bit blake2b STRING hashes —
    the per-doc reference implementation `gram_rows_batch` is
    equivalence-tested against (the batch path is what the pipelines
    run)."""
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
        _, g, _ = gram_rows_batch(batch.column("text").to_pylist(), n)
        return pa.table({"h": pa.array(np.unique(g))})

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
        rows, g, _ = gram_rows_batch(batch.column("text").to_pylist(), n)
        counts = np.bincount(
            rows[np.isin(g, bset)], minlength=batch.num_rows
        ).astype(np.int64)
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
        nl, nu, nw, tc = line_word_stats_batch(batch.column("text").to_pylist())
        dup, top, flag = [], [], []
        for l, u, w_, c in zip(nl.tolist(), nu.tolist(), nw.tolist(), tc.tolist()):
            d = round((l - u) / l, 6)
            w = round(c / w_, 6) if w_ else 0.0
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


def _novelty_partials(
    docs: rd.Dataset, n: int, num_buckets: int
) -> rd.Dataset:
    """(doc_id, n_grams, n_novel) per doc with ≥ ``n`` words, UNSORTED —
    the shared core of `gram_novelty`'s direct and collapsed paths."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        rows, g, _ = gram_rows_batch(batch.column("text").to_pylist(), n)
        return pa.table(
            {
                "cb": pa.array((g % num_buckets).astype(np.int32)),
                "gram": pa.array(g, pa.int64()),
                "doc_id": pa.array(ids[rows], pa.int64()),
            }
        )

    def bucket_partial(group: pa.Table) -> pa.Table:
        """All gram runs of one coarse bucket: the first row of each
        (gram-sorted, doc-ascending) run is the gram's earliest doc."""
        g = group.column("gram").combine_chunks().to_numpy(zero_copy_only=False)
        d = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        if not len(g):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "n_novel": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((d, g))
        sg, sd = g[order], d[order]
        new = np.concatenate([[True], sg[1:] != sg[:-1]])
        starts = np.nonzero(new)[0]
        run_id = np.cumsum(new) - 1
        novel = (sd == sd[starts][run_id]).astype(np.int64)
        # per-doc bucket partials
        dorder = np.argsort(sd, kind="stable")
        dd_ = sd[dorder]
        dnew = np.concatenate([[True], dd_[1:] != dd_[:-1]])
        dstarts = np.nonzero(dnew)[0]
        return pa.table(
            {
                "doc_id": pa.array(dd_[dstarts]),
                "n_grams": pa.array(np.diff(np.concatenate([dstarts, [len(dd_)]]))
                                    .astype(np.int64)),
                "n_novel": pa.array(np.add.reduceat(novel[dorder], dstarts)),
            }
        )

    from .fold import fold_int_sums_by_key

    partials = (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(bucket_partial, batch_format="pyarrow")
    )
    return fold_int_sums_by_key(partials, cols=["n_grams", "n_novel"])


def _expand_novelty_groups(
    scores: rd.Dataset, mapping: rd.Dataset, num_buckets: int
) -> rd.Dataset:
    """Propagate representative-level (n_grams, n_novel) back to every
    member of each exact group — a bucketed hash-join on ``rep`` (no
    driver state).  Every member inherits the rep's gram count; only the
    rep itself can own first occurrences (any gram of a non-rep member
    also occurs in its rep, whose doc_id is the group minimum), so members
    get ``n_novel = 0``.  Reps with no score row (texts under ``n`` words)
    contribute nothing — exactly as their members would."""

    def tag_scores(batch: pa.Table) -> pa.Table:
        rep = batch.column("doc_id").combine_chunks()
        rv = rep.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "rep": rep,
                "doc_id": pa.nulls(batch.num_rows, pa.int64()),
                "n_grams": batch.column("n_grams").cast(pa.int64()),
                "n_novel": batch.column("n_novel").cast(pa.int64()),
                "_bkt": pa.array(rv % num_buckets, pa.int64()),
            }
        )

    def tag_mapping(batch: pa.Table) -> pa.Table:
        rep = batch.column("rep").combine_chunks()
        rv = rep.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "rep": rep,
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_grams": pa.nulls(batch.num_rows, pa.int64()),
                "n_novel": pa.nulls(batch.num_rows, pa.int64()),
                "_bkt": pa.array(rv % num_buckets, pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        side_score = pc.is_null(group.column("doc_id"))
        sc = group.filter(side_score)
        mp = group.filter(pc.invert(side_score))
        srep = sc.column("rep").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(srep, kind="stable")
        srep = srep[order]
        sng = sc.column("n_grams").combine_chunks().to_numpy(zero_copy_only=False)[order]
        snv = sc.column("n_novel").combine_chunks().to_numpy(zero_copy_only=False)[order]
        mrep = mp.column("rep").combine_chunks().to_numpy(zero_copy_only=False)
        mdoc = mp.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(srep, mrep)
        found = (pos < len(srep)) & (srep[np.minimum(pos, max(len(srep) - 1, 0))] == mrep) if len(srep) else np.zeros(len(mrep), bool)
        pos, mrep, mdoc = pos[found], mrep[found], mdoc[found]
        return pa.table(
            {
                "doc_id": pa.array(mdoc, pa.int64()),
                "n_grams": pa.array(sng[pos], pa.int64()),
                "n_novel": pa.array(
                    np.where(mdoc == mrep, snv[pos], 0), pa.int64()
                ),
            }
        )

    tagged = scores.map_batches(tag_scores, batch_format="pyarrow").union(
        mapping.map_batches(tag_mapping, batch_format="pyarrow")
    )
    return tagged.groupby("_bkt").map_groups(merge, batch_format="pyarrow")


def gram_novelty(
    sf_dir: str,
    *,
    n: int = NGRAM,
    num_buckets: int = 64,
    collapse_exact: bool = False,
) -> rd.Dataset:
    """First-occurrence novelty score per doc: the fraction of a doc's
    DISTINCT word ``n``-grams whose earliest corpus occurrence (minimum
    doc_id over all docs containing the gram) is this doc.  Docs that
    mostly restate earlier content score near 0; fresh content scores near
    1 — the "new information" curation signal dual to
    `duplicate_ngram_spans`' positional boilerplate count.

    Scale shape: one map pass emits the distinct (gram, doc) pairs of each
    batch (`gram_rows_batch` — one RE2 split + one blake2b per distinct
    word), ONE gram-keyed shuffle (coarse gram-hash buckets, all runs of a
    bucket processed in one vectorized call) computes each gram's earliest
    doc and re-emits per-doc (n_grams, n_novel) bucket partials, and the
    shared hash-bucket fold sums the ≤ ``num_buckets`` partials per doc.
    The shuffle carries one row per distinct (gram, doc) — the same volume
    as `duplicate_ngram_spans`.

    ``collapse_exact=True`` is the crawl-scale path (the dedup-family
    trick): sha1-collapse exact duplicate texts first (one hash shuffle),
    run the gram shuffle over DISTINCT texts only, then expand through the
    exact groups — a member's grams all occur in its representative (the
    group's minimum doc_id), so members inherit the rep's ``n_grams`` with
    ``n_novel = 0`` and the rep keeps the group's first occurrences.
    Byte-identical to the direct path (pytest-pinned); on duplicate-heavy
    corpora the (gram, doc) shuffle shrinks by the duplication factor.

    Returns (doc_id, n_grams, n_novel, novelty) for docs with ≥ ``n``
    words, sorted by doc_id; ``novelty`` rounds half-even to 6 places so
    the floats are bit-equal to the DuckDB twin.  Gram identity is by
    64-bit hash on the Ray side vs raw strings in the SQL twin (same
    collision argument as `decontaminate`).
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    if collapse_exact:
        from .dedup import _exact_collapse

        reps, mapping = _exact_collapse(docs)
        agg = _expand_novelty_groups(
            _novelty_partials(reps, n, num_buckets), mapping, num_buckets
        )
    else:
        agg = _novelty_partials(docs, n, num_buckets)

    def finish(batch: pa.Table) -> pa.Table:
        ng = batch.column("n_grams").combine_chunks().to_numpy(zero_copy_only=False)
        nv = batch.column("n_novel").combine_chunks().to_numpy(zero_copy_only=False)
        # Python round == round_even; int->float conversions and the divide
        # are single IEEE ops, identical in the DuckDB twin
        frac = [round(float(v) / float(g), 6) for v, g in zip(nv, ng)]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": batch.column("n_grams").cast(pa.int64()),
                "n_novel": batch.column("n_novel").cast(pa.int64()),
                "novelty": pa.array(frac, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("doc_id")


# --- Gopher quality rules (Rae et al. 2021, Table A1 — public) --------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOPWORDS = 2
# the paper's fixed stop list (§A1.1): ≥2 occurrences required
GOPHER_STOPWORDS = frozenset(
    ("the", "be", "to", "of", "and", "that", "have", "with")
)
_ALPHA_RE = re.compile(r"[A-Za-z]")
_ELLIPSIS_RE = re.compile(r"\.\.\.")


def gopher_quality_signals_batch(
    texts: list[str | None],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-text int64 arrays (n_words, sum_word_len, n_alpha_words,
    n_stopwords, n_symbols) over the ASCII ``\\S+`` tokens — the Gopher
    rule inputs, batched: ONE RE2 split + ``dictionary_encode`` per batch,
    one regex/length/membership evaluation per DISTINCT token, then
    integer bincounts back to rows (property-tested against the per-doc
    reference in tests/test_decontam.py)."""
    from ..functions.tokenize import WS_SPLIT, explode_tokens

    m = len(texts)
    z = np.zeros(m, np.int64)
    if m == 0:
        return z, z.copy(), z.copy(), z.copy(), z.copy()
    rows, codes, dic = explode_tokens(texts, pattern=WS_SPLIT, lower=False)
    words = dic.to_pylist()
    wlen = np.fromiter((len(w) for w in words), np.int64, count=len(words))
    walpha = np.fromiter(
        (1 if _ALPHA_RE.search(w) else 0 for w in words), np.int64, count=len(words)
    )
    wstop = np.fromiter(
        (1 if w.lower() in GOPHER_STOPWORDS else 0 for w in words),
        np.int64,
        count=len(words),
    )
    n_words = np.bincount(rows, minlength=m).astype(np.int64)
    # bincount weights are float64 — exact here (per-doc sums << 2^53)
    sum_len = np.bincount(rows, weights=wlen[codes], minlength=m).astype(np.int64)
    n_alpha = np.bincount(rows, weights=walpha[codes], minlength=m).astype(np.int64)
    n_stop = np.bincount(rows, weights=wstop[codes], minlength=m).astype(np.int64)
    n_sym = np.fromiter(
        (
            (t or "").count("#") + len(_ELLIPSIS_RE.findall(t or ""))
            for t in texts
        ),
        np.int64,
        count=m,
    )
    return n_words, sum_len, n_alpha, n_stop, n_sym


def gopher_quality_flags(sf_dir: str) -> rd.Dataset:
    """The full Gopher document-quality rule bundle (Rae et al. 2021 §A1.1,
    as also applied by RefinedWeb/Dolma): word-count bounds, mean-word-length
    bounds, symbol-to-word ratio (``#`` and ``...``), fraction of words with
    ≥1 alphabetic character, and the ≥2-stopword requirement.  Pure
    per-batch map over the corpus — no shuffle; at 10^12 docs this stage
    fuses into the read.

    Returns (doc_id, n_words, mean_word_len, alpha_word_frac, symbol_ratio,
    stopword_count, gopher_pass) for docs with ≥1 token, sorted by doc_id.
    Ratios round half-even to 6 places and the pass flag is computed FROM
    the rounded values on both sides, so the DuckDB twin matches
    bit-for-bit.
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def flags(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        nw, sl, na, ns, sym = gopher_quality_signals_batch(
            batch.column("text").to_pylist()
        )
        keep = nw > 0
        out_ids, nw, sl, na, ns, sym = (
            a[keep] for a in (ids, nw, sl, na, ns, sym)
        )
        mean_len, alpha_frac, sym_ratio, ok = [], [], [], []
        for w, s, a, st, sy in zip(
            nw.tolist(), sl.tolist(), na.tolist(), ns.tolist(), sym.tolist()
        ):
            ml = round(float(s) / float(w), 6)
            af = round(float(a) / float(w), 6)
            sr = round(float(sy) / float(w), 6)
            mean_len.append(ml)
            alpha_frac.append(af)
            sym_ratio.append(sr)
            ok.append(
                GOPHER_MIN_WORDS <= w <= GOPHER_MAX_WORDS
                and GOPHER_MIN_MEAN_WORD_LEN <= ml <= GOPHER_MAX_MEAN_WORD_LEN
                and af >= GOPHER_MIN_ALPHA_FRAC
                and sr <= GOPHER_MAX_SYMBOL_RATIO
                and st >= GOPHER_MIN_STOPWORDS
            )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "mean_word_len": pa.array(mean_len, pa.float64()),
                "alpha_word_frac": pa.array(alpha_frac, pa.float64()),
                "symbol_ratio": pa.array(sym_ratio, pa.float64()),
                "stopword_count": pa.array(ns, pa.int64()),
                "gopher_pass": pa.array(ok),
            }
        )

    return docs.map_batches(flags, batch_format="pyarrow").sort("doc_id")


C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


def c4_quality_filters(sf_dir: str) -> rd.Dataset:
    """The C4 line/page cleaning heuristics (Raffel et al. 2020 §2.2, as
    also applied by mC4/Dolma): keep only lines that end in terminal
    punctuation (``.!?"``), have ≥5 words, and don't mention
    ``javascript``; drop pages with <3 sentences in the retained text,
    any ``{``, or the phrase ``lorem ipsum``.  Pure per-batch map over
    the corpus — no shuffle; at 10^12 docs this stage fuses into the
    read.  Every per-line predicate is ONE Arrow RE2 kernel over the
    flattened line array (split → flatten → match/count → bincount back
    to docs) — no Python loop touches line content.

    Returns (doc_id, n_lines, kept_lines, kept_words, n_sentences,
    c4_keep) sorted by doc_id.  Word = RE2 ``\\S+`` token; sentence count
    = terminal-punctuation (``.!?``) occurrences in the retained lines —
    both exactly recomputable in the DuckDB twin.
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    return docs.map_batches(_c4_flags_batch, batch_format="pyarrow").sort("doc_id")


def _c4_flags_batch(batch: pa.Table) -> pa.Table:
    """The C4 per-batch kernel (shared by `c4_quality_filters` and
    `textstats.dataset_card` so the keep rule cannot drift)."""
    ids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
    m = len(ids)
    text = pc.fill_null(batch.column("text").combine_chunks(), "")
    lines = pc.split_pattern(text, "\n")
    lens = np.asarray(pc.list_value_length(lines), dtype=np.int64)
    flat = pc.utf8_rtrim(pc.list_flatten(lines), " \t\r")
    rows = np.repeat(np.arange(m, dtype=np.int64), lens)
    nw = np.asarray(pc.count_substring_regex(flat, r"\S+"), dtype=np.int64)
    ends_term = np.asarray(pc.match_substring_regex(flat, '[.!?"]$'), dtype=bool)
    has_js = np.asarray(
        pc.match_substring(pc.utf8_lower(flat), "javascript"), dtype=bool
    )
    kept = ends_term & (nw >= C4_MIN_LINE_WORDS) & ~has_js
    nsent = np.asarray(pc.count_substring_regex(flat, "[.!?]"), dtype=np.int64)
    n_lines = lens
    kept_lines = np.bincount(rows, weights=kept, minlength=m).astype(np.int64)
    # float64 bincount weights are exact (per-doc sums << 2^53)
    kept_words = np.bincount(
        rows, weights=np.where(kept, nw, 0), minlength=m
    ).astype(np.int64)
    n_sentences = np.bincount(
        rows, weights=np.where(kept, nsent, 0), minlength=m
    ).astype(np.int64)
    has_lorem = np.asarray(
        pc.match_substring(pc.utf8_lower(text), "lorem ipsum"), dtype=bool
    )
    has_brace = np.asarray(pc.match_substring(text, "{"), dtype=bool)
    keep = (
        (kept_lines >= 1)
        & (n_sentences >= C4_MIN_SENTENCES)
        & ~has_lorem
        & ~has_brace
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_lines": pa.array(n_lines),
            "kept_lines": pa.array(kept_lines),
            "kept_words": pa.array(kept_words),
            "n_sentences": pa.array(n_sentences),
            "c4_keep": pa.array(keep),
        }
    )


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
        ids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        rows, g, cnt = gram_rows_batch(batch.column("text").to_pylist(), n)
        return pa.table(
            {
                "gram": pa.array(g, pa.int64()),
                "doc_id": pa.array(ids[rows], pa.int64()),
                "n_pos": pa.array(cnt, pa.int64()),
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
    from .fold import fold_int_sums_by_key

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "n_dup_positions"])

    return (
        fold_int_sums_by_key(pairs.map_batches(rename, batch_format="pyarrow"),
                             cols=["n_dup_positions"])
        .sort("doc_id")
    )


# --- jusText-style boilerplate strip ---------------------------------------
# Pomikálek 2011 ("Removing boilerplate and duplicate content from web
# corpora", jusText): segment the document, classify each segment
# context-free by stopword density + length, then promote borderline
# segments adjacent to good ones.  The reference engine's HTML path keeps
# main content by DOM span kinds (oracle.extract_document); this is the
# statistical complement used when no markup survives: the corpus is a
# markup-free token stream, so the "paragraph" stand-in is a fixed
# 20-token block (deterministic, twin-recomputable).
JUSTEXT_BLOCK_WORDS = 20
JUSTEXT_MIN_WORDS = 5  # blocks shorter than this are never good on their own
# corpus function words (the synthetic vocabulary's only two stopwords);
# density rule is float-free: good iff stop_count * 10 >= n_words (>=10%)
JUSTEXT_STOPWORDS = frozenset(("the", "a"))


def justext_boilerplate(sf_dir: str) -> rd.Dataset:
    """Block-level boilerplate strip: per doc, split the token stream into
    20-token blocks, classify each block context-free
    (short / bad / near / good by the integer stopword-density rule), then
    run jusText's context pass — a ``near`` block becomes good iff an
    adjacent block of the SAME doc is context-free good.  Pure per-batch
    map (blocks never cross doc boundaries, docs never cross batch
    boundaries) — no shuffle; at 10^12 docs this fuses into the read, the
    same plan shape as `gopher_quality_flags`.

    Returns (doc_id, n_blocks, n_good, n_promoted, kept_words) for docs
    with ≥1 token, sorted by doc_id; the DuckDB twin recomputes the whole
    rule with list_filter + lag/lead windows (exact integer arithmetic
    end-to-end, no floats anywhere).
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(_justext_batch, batch_format="pyarrow").sort("doc_id")


def _justext_batch(batch: pa.Table) -> pa.Table:
    from ..functions.tokenize import WS_SPLIT, explode_tokens

    ids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
    m = len(ids)
    rows, codes, dic = explode_tokens(
        batch.column("text").to_pylist(), pattern=WS_SPLIT, lower=False
    )
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_blocks": pa.array([], pa.int64()),
            "n_good": pa.array([], pa.int64()),
            "n_promoted": pa.array([], pa.int64()),
            "kept_words": pa.array([], pa.int64()),
        }
    )
    if len(rows) == 0:
        return empty
    dic_list = dic.to_pylist()
    is_stop = np.fromiter(
        ((w or "").lower() in JUSTEXT_STOPWORDS for w in dic_list),
        dtype=bool,
        count=len(dic_list),
    )
    stop_occ = is_stop[codes]
    # token position within its doc (rows is row-major sorted)
    new = np.concatenate([[True], rows[1:] != rows[:-1]])
    run_starts = np.nonzero(new)[0]
    run_id = np.cumsum(new) - 1
    pos = np.arange(len(rows), dtype=np.int64) - run_starts[run_id]
    blk = pos // JUSTEXT_BLOCK_WORDS
    # per-(doc, block) fold; the composite key preserves (doc, blk) order
    width = int(blk.max()) + 1
    comb = rows * width + blk
    uk, inv = np.unique(comb, return_inverse=True)
    nb = len(uk)
    nw = np.bincount(inv, minlength=nb).astype(np.int64)
    sc = np.bincount(inv, weights=stop_occ, minlength=nb).astype(np.int64)
    bdoc = uk // width
    # context-free classes (precedence: short, good, near, bad)
    short = nw < JUSTEXT_MIN_WORDS
    good = (~short) & (sc * 10 >= nw)
    near = (~short) & (~good) & (sc >= 1)
    # context pass: near + an adjacent context-free-good block in SAME doc
    same_prev = np.concatenate([[False], bdoc[1:] == bdoc[:-1]])
    same_next = np.concatenate([bdoc[1:] == bdoc[:-1], [False]])
    prev_good = np.concatenate([[False], good[:-1]]) & same_prev
    next_good = np.concatenate([good[1:], [False]]) & same_next
    promoted = near & (prev_good | next_good)
    final_good = good | promoted
    n_blocks = np.bincount(bdoc, minlength=m).astype(np.int64)
    n_good = np.bincount(bdoc, weights=final_good, minlength=m).astype(np.int64)
    n_prom = np.bincount(bdoc, weights=promoted, minlength=m).astype(np.int64)
    kept = np.bincount(
        bdoc, weights=np.where(final_good, nw, 0), minlength=m
    ).astype(np.int64)
    has = n_blocks > 0
    return pa.table(
        {
            "doc_id": pa.array(ids[has], pa.int64()),
            "n_blocks": pa.array(n_blocks[has]),
            "n_good": pa.array(n_good[has]),
            "n_promoted": pa.array(n_prom[has]),
            "kept_words": pa.array(kept[has]),
        }
    )
