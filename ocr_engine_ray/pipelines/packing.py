"""Sequence packing — assign every document a global token offset and a
fixed-budget training-sequence id, in (source, doc_id) scan order.

This is the batch-prep step that turns a curated corpus into fixed-length
training sequences (token-offset sharding: sequence k of a source holds the
docs whose running token offset falls in [k*budget, (k+1)*budget)).

The interesting part is the *distributed prefix sum*: a running cumsum over
an entire source partition cannot be a single ``map_groups`` at 100 TB (one
source may hold 10^10 docs).  Standard two-pass scan instead:

1. one tokenize pass attaches ``n_tokens`` and an ORDER-PRESERVING range
   bucket of ``doc_id`` (monotone float map over the [min, max] id span —
   every doc in bucket b precedes every doc in bucket b+1), then the narrow
   projection (ints + source only, text dropped) is materialized so
   tokenization never runs twice;
2. a ``groupby(source, bucket)`` partial-sum yields sources × num_buckets
   rows — the ONLY thing the driver sees; exclusive per-source prefix
   offsets over those partials are broadcast back via ``ray.put``;
3. a second ``groupby(source, bucket)`` sorts each bucket by doc_id and adds
   offset + vectorized cumsum — exact global offsets with no global sort and
   no driver data path.

``num_buckets`` is the scale knob (bucket rows ≈ corpus/num_buckets must fit
a worker heap), same contract as connected_components' rows_per_bucket.

Exact-SQL-gated: the DuckDB twin is a window cumsum
``sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..sources.tables import sf_table

_TOKEN_RE = r"\S+"  # RE2 token class, bitwise-equal to the SQL oracle's _TOK


def pack_token_stream(
    tok: rd.Dataset, *, budget: int, bucket_col: str = "bucket"
) -> rd.Dataset:
    """The two-pass distributed prefix sum over a (doc_id, source, n_tokens,
    ``bucket_col``) token stream: per-(source, bucket) partial sums →
    broadcast exclusive offsets → in-bucket doc_id sort + vectorized cumsum.
    Returns (doc_id, source, n_tokens, tok_offset, seq_id) sorted by doc_id.

    ``tok`` is consumed twice (partials, then pack), so pass it
    MATERIALIZED.  The bucket column must be an order-preserving partition
    of doc_id within each source (every row of bucket b precedes bucket
    b+1).  Shared by `pack_sequences` and `curate.curate_training_mix` so
    the packing semantics cannot drift between the two gated surfaces."""
    parts = tok.groupby(["source", bucket_col]).aggregate(
        Sum("n_tokens", alias_name="tot")
    ).take_all()
    offsets: dict[tuple[str, int], int] = {}
    acc: dict[str, int] = {}
    for r in sorted(parts, key=lambda r: (r["source"], r[bucket_col])):
        offsets[(r["source"], r[bucket_col])] = acc.get(r["source"], 0)
        acc[r["source"]] = acc.get(r["source"], 0) + r["tot"]
    off_ref = ray.put(offsets)

    def pack(group: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        ids = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        ntok = group.column("n_tokens").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, ntok = ids[order], ntok[order]
        src = group.column("source")[0].as_py()
        base = off[(src, group.column(bucket_col)[0].as_py())]
        tok_offset = base + np.cumsum(ntok) - ntok
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "source": pa.array(np.full(len(ids), src, dtype=object), pa.string()),
                "n_tokens": pa.array(ntok),
                "tok_offset": pa.array(tok_offset),
                "seq_id": pa.array(tok_offset // budget),
            }
        )

    return (
        tok.groupby(["source", bucket_col])
        .map_groups(pack, batch_format="pyarrow")
        .sort("doc_id")
    )


def pack_sequences(
    sf_dir: str, *, budget: int = 512, num_buckets: int = 64
) -> rd.Dataset:
    """(doc_id, source, n_tokens, tok_offset, seq_id) for every doc:
    ``tok_offset`` = exclusive running token sum within the source in doc_id
    order, ``seq_id`` = tok_offset // budget.  Sorted by doc_id."""
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    # bounds from a doc_id-only scan: the 3-column `docs` projection would
    # drag the whole text column through an aggregate that needs one int
    bounds = sf_table(sf_dir, "documents", columns=["doc_id"]).aggregate(
        Min("doc_id"), Max("doc_id")
    )
    if not bounds or bounds.get("min(doc_id)") is None:  # empty corpus
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
    lo, hi = bounds["min(doc_id)"], bounds["max(doc_id)"]
    span = max(1, hi - lo + 1)

    def tok_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        # monotone non-decreasing id -> bucket map (float mul/div are
        # order-preserving for non-negative operands, so bucket order ==
        # doc_id order even at int64-span corpora)
        bkt = ((ids - lo).astype(np.float64) * num_buckets / span).astype(np.int64)
        np.clip(bkt, 0, num_buckets - 1, out=bkt)
        ntok = pc.count_substring_regex(
            pc.fill_null(batch.column("text"), ""), _TOKEN_RE
        ).cast(pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "bucket": pa.array(bkt),
                "n_tokens": ntok,
            }
        )

    # Tokenize ONCE; the materialized projection is 3 int columns + source
    # (text dropped) — tiny next to the corpus, reused by both passes.
    tok = docs.map_batches(tok_rows, batch_format="pyarrow").materialize()
    return pack_token_stream(tok, budget=budget)


def rank_by_quality(sf_dir: str, *, num_buckets: int = 64) -> rd.Dataset:
    """Distributed ``row_number() OVER (PARTITION BY source ORDER BY quality,
    doc_id)`` — global per-source ranking without a global sort.

    Same two-pass prefix-sum shape as `pack_sequences`, but the scan order
    is a FLOAT key: quality ∈ [0,1] buckets order-preservingly by
    ``floor(q * B)``, per-(source, bucket) counts give exclusive rank
    offsets, and each bucket sorts (quality, doc_id) locally.  Ranking /
    percentile normalization is the standard prelude to quality-threshold
    curation at a fixed keep-rate.  Returns (doc_id, source, quality,
    rank_in_source) sorted by doc_id."""
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def score(batch: pa.Table) -> pa.Table:
        from .textstats import quality_scores_batch

        q = np.array(quality_scores_batch(batch.column("text").to_pylist()))
        bkt = np.clip((q * num_buckets).astype(np.int64), 0, num_buckets - 1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "quality": pa.array(q, pa.float64()),
                "bucket": pa.array(bkt),
            }
        )

    scored = docs.map_batches(score, batch_format="pyarrow").materialize()
    parts = scored.groupby(["source", "bucket"]).aggregate(
        Count(alias_name="n")
    ).take_all()
    offsets: dict[tuple[str, int], int] = {}
    acc: dict[str, int] = {}
    for r in sorted(parts, key=lambda r: (r["source"], r["bucket"])):
        offsets[(r["source"], r["bucket"])] = acc.get(r["source"], 0)
        acc[r["source"]] = acc.get(r["source"], 0) + r["n"]
    off_ref = ray.put(offsets)

    def rank(group: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        ids = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        q = group.column("quality").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, q))
        src = group.column("source")[0].as_py()
        base = off[(src, group.column("bucket")[0].as_py())]
        rk = np.empty(len(ids), dtype=np.int64)
        rk[order] = base + np.arange(1, len(ids) + 1)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "source": pa.array(np.full(len(ids), src, dtype=object), pa.string()),
                "quality": pa.array(q),
                "rank_in_source": pa.array(rk),
            }
        )

    return (
        scored.groupby(["source", "bucket"])
        .map_groups(rank, batch_format="pyarrow")
        .sort("doc_id")
    )


# RE2's `\S` is the ASCII complement [^ \t\n\f\r] — NO \v: RE2/DuckDB `\s`
# is [\t\n\f\r ] only.  One canonical compiled class lives in
# textstats._ASCII_TOK_RE (Python's \S is Unicode-wide, the same lesson as
# the \w tokenizers); delegating keeps exactly one copy to fix when the
# RE2-alignment contract next changes.
def _tokens(text: str) -> list[str]:
    from .textstats import _py_tokens

    return _py_tokens(text)


def chunk_token_windows(
    sf_dir: str, *, window: int = 64, stride: int = 48
) -> rd.Dataset:
    """Split every document into overlapping token windows — the
    context-window prep step (RAG / embedding corpora): chunk ``k`` of a
    doc covers tokens ``[k*stride, k*stride + window)``; the tail chunk is
    shorter; a 0-token doc yields no chunks.

    Returns (doc_id, chunk_id, tok_start, n_tok_chunk, chunk_text), one row
    per chunk, sorted by (doc_id, chunk_id).  Pure per-batch flat
    expansion — zero shuffles except the final deterministic sort (drop the
    sort at scale and stream chunks straight to the sink).  Exact-SQL-gated:
    the DuckDB twin re-derives every chunk with ``regexp_extract_all`` +
    ``range(0, n, stride)`` + 1-based list slicing.
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def expand(batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        cid_out: list[int] = []
        start_out: list[int] = []
        len_out: list[int] = []
        text_out: list[str] = []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = _tokens(t)
            n = len(ws)
            for k, s in enumerate(range(0, n, stride)):
                m = min(window, n - s)
                ids_out.append(d)
                cid_out.append(k)
                start_out.append(s)
                len_out.append(m)
                text_out.append(" ".join(ws[s : s + m]))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "chunk_id": pa.array(cid_out, pa.int64()),
                "tok_start": pa.array(start_out, pa.int64()),
                "n_tok_chunk": pa.array(len_out, pa.int64()),
                "chunk_text": pa.array(text_out, pa.string()),
            }
        )

    return docs.map_batches(expand, batch_format="pyarrow").sort(
        ["doc_id", "chunk_id"]
    )


def top_quality_fraction(sf_dir: str, *, percent: int = 25) -> rd.Dataset:
    """Per-source fixed keep-rate quality curation: keep each source's top
    ``percent``% of documents by (quality, doc_id) rank — the standard
    "keep the best quarter of every domain" filter, with the cutoff
    computed in exact integer arithmetic (``k_s = n_s * percent // 100``)
    so the SQL twin's window functions reproduce it bit-for-bit.

    Built on the distributed two-pass ranking (`rank_by_quality` — no
    global sort); per-source totals are sources-sized scalars broadcast
    via ``ray.put``.  Returns the kept (doc_id, source, quality,
    rank_in_source), sorted by doc_id."""
    import ray
    from ray.data.aggregate import Count

    ranked = rank_by_quality(sf_dir).materialize()
    parts = ranked.groupby("source").aggregate(Count(alias_name="n")).take_all()
    cutoff = {r["source"]: r["n"] - (r["n"] * percent) // 100 for r in parts}
    cut_ref = ray.put(cutoff)

    def keep(batch: pa.Table) -> pa.Table:
        cut = ray.get(cut_ref)
        thr = np.array(
            [cut[s] for s in batch.column("source").to_pylist()], dtype=np.int64
        )
        rk = batch.column("rank_in_source").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        return batch.filter(pa.array(rk > thr))

    return ranked.map_batches(keep, batch_format="pyarrow")


def quality_ntiles(sf_dir: str, *, tiles: int = 4) -> rd.Dataset:
    """Per-source quality QUARTILES (NTILE) on top of the distributed
    two-pass ranking — the percentile-bucket primitive curriculum ordering
    and threshold curation read (which quartile is a doc in, and where do
    the quartile boundaries sit per source).

    NTILE's exact integer split (the first ``n % tiles`` tiles get one
    extra row) is computed per row from (rank_in_source, per-source n) —
    no further shuffle beyond `rank_by_quality`'s own: per-source totals
    are a sources-sized aggregate broadcast once, the tile assignment is
    vectorized arithmetic, and the final (source, tile) groupby moves
    tiles × sources × blocks rows.

    Returns (source, tile, n_docs, lo_q, hi_q) sorted by (source, tile);
    twin is the NTILE window over the identical quality expression.
    """
    ranked = rank_by_quality(sf_dir)
    totals = ranked.groupby("source").aggregate(Count(alias_name="n")).take_all()
    nmap = {r["source"]: r["n"] for r in totals}
    nref = ray.put(nmap)

    def tile_of(batch: pa.Table, *, ref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "tile": pa.array([], pa.int64()),
                    "quality": pa.array([], pa.float64()),
                }
            )
        nm = ray.get(ref)
        src = batch.column("source").to_pylist()
        r = batch.column("rank_in_source").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        n = np.array([nm[s] for s in src], dtype=np.int64)
        size_small = n // tiles
        n_big = n % tiles
        cut = n_big * (size_small + 1)
        r0 = r - 1
        # NTILE: ranks ≤ cut land in the (size_small+1)-sized tiles, the
        # rest in size_small-sized ones; size_small is 0 only when every
        # row is in a big tile (n < tiles), so the else branch never
        # divides by it there
        tile = (
            np.where(
                r <= cut,
                r0 // (size_small + 1),
                n_big + (r0 - cut) // np.maximum(size_small, 1),
            )
            + 1
        )
        return pa.table(
            {
                "source": batch.column("source"),
                "tile": pa.array(tile.astype(np.int64)),
                "quality": batch.column("quality"),
            }
        )

    agg = (
        ranked.map_batches(tile_of, batch_format="pyarrow", fn_kwargs={"ref": nref})
        .groupby(["source", "tile"])
        .aggregate(
            Count(alias_name="n_docs"),
            Min("quality", alias_name="lo_q"),
            Max("quality", alias_name="hi_q"),
        )
    )
    return agg.sort(["source", "tile"])


COMPACT_FILES_BLOCK = 16
COMPACT_TARGET_BYTES = 20_000


def compact_shards(
    sf_dir: str,
    *,
    files_block: int = COMPACT_FILES_BLOCK,
    target_bytes: int = COMPACT_TARGET_BYTES,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Small-file compaction PLANNER (the lakehouse OPTIMIZE/bin-packing
    maintenance pass): group each partition's files, in file order, into
    output files of ~``target_bytes`` by the sequential rule — a file
    joins output bin ``exclusive_running_size // target`` (a new bin
    starts once the running total crosses the target), the same
    first-fit-in-order policy Delta/Iceberg compaction uses so a planner
    re-run after appends never reshuffles already-compacted prefixes.

    The file manifest is synthesized deterministically from the corpus
    (file = (source, doc_id // ``files_block``), size = Σ n_chars) — at
    production scale it would be the table's real file listing; the
    planner itself never reads data, only the manifest.

    Scale shape: ONE pre-combined manifest aggregate (per-batch
    np-unique partials → exact Sum), then the SAME two-pass distributed
    prefix sum as `pack_token_stream` (per-(source, range-bucket)
    partials → broadcast exclusive offsets → in-bucket vectorized
    cumsum) — no whole-partition task, no driver on the data path.

    Returns (source, file_id, size_bytes, byte_offset, out_file) sorted
    by (source, file_id); window-cumsum twin.
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    bounds = sf_table(sf_dir, "documents", columns=["doc_id"]).aggregate(
        Min("doc_id"), Max("doc_id")
    )
    if not bounds or bounds.get("min(doc_id)") is None:
        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "file_id": pa.array([], pa.int64()),
                    "size_bytes": pa.array([], pa.int64()),
                    "byte_offset": pa.array([], pa.int64()),
                    "out_file": pa.array([], pa.int64()),
                }
            )
        )
    flo = bounds["min(doc_id)"] // files_block
    fhi = bounds["max(doc_id)"] // files_block
    span = max(1, fhi - flo + 1)

    def man_rows(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["file_id"] = df["doc_id"] // files_block
        g = (
            df.groupby(["source", "file_id"], sort=False)["n_chars"]
            .sum()
            .reset_index()
        )
        fid = g["file_id"].to_numpy()
        bkt = ((fid - flo).astype(np.float64) * num_buckets / span).astype(np.int64)
        np.clip(bkt, 0, num_buckets - 1, out=bkt)
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "doc_id": pa.array(fid, pa.int64()),  # pack key = file_id
                "bucket": pa.array(bkt),
                "n_tokens": pa.array(g["n_chars"].to_numpy(), pa.int64()),
            }
        )

    man = (
        docs.map_batches(man_rows, batch_format="pyarrow")
        .groupby(["source", "doc_id", "bucket"])
        .aggregate(Sum("n_tokens", alias_name="n_tokens"))
        .materialize()  # manifest volume: one row per file, not per doc
    )
    packed = pack_token_stream(man, budget=target_bytes)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch.column("source"),
                "file_id": batch.column("doc_id").cast(pa.int64()),
                "size_bytes": batch.column("n_tokens").cast(pa.int64()),
                "byte_offset": batch.column("tok_offset").cast(pa.int64()),
                "out_file": batch.column("seq_id").cast(pa.int64()),
            }
        )

    return packed.map_batches(rename, batch_format="pyarrow").sort(
        ["source", "file_id"]
    )


def length_bucket_padding(
    sf_dir: str, *, batch_size: int = 32, num_buckets: int = 64
) -> rd.Dataset:
    """Padding-waste audit for length-grouped training batches — the
    planning number behind bucketed batching (every trainer pads each
    batch to its longest sequence; sorting by length before batching is
    the standard fix): form ``batch_size``-doc batches two ways — LENGTH
    order (n_tokens, doc_id) vs NATURAL doc_id order — and report each
    plan's exact total padding Σ_batches (max_len·batch_rows − Σlen).

    Scale shape: tokenize once into the tiny (doc_id, n_tokens)
    projection; each plan is ONE distributed ranking (the value-bucket /
    key-bucket prefix sums this module already uses) followed by a
    batch-keyed aggregate of 3-int partials; all arithmetic exact int64
    (padding ≤ tokens ≤ corpus size).  Returns one row (batch_size,
    n_docs, n_batches, total_tokens, padding_sorted, padding_natural,
    saved_ppm) where saved_ppm = (nat − sorted)·10^6 // max(nat, 1).
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tok_rows(batch: pa.Table) -> pa.Table:
        ntok = pc.count_substring_regex(
            pc.fill_null(batch.column("text"), ""), _TOKEN_RE
        ).cast(pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"), "n": ntok})

    tok = docs.map_batches(tok_rows, batch_format="pyarrow").materialize()
    n_docs = tok.count()
    if n_docs == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "batch_size": pa.array([batch_size], pa.int64()),
                    "n_docs": pa.array([0], pa.int64()),
                    "n_batches": pa.array([0], pa.int64()),
                    "total_tokens": pa.array([0], pa.int64()),
                    "padding_sorted": pa.array([0], pa.int64()),
                    "padding_natural": pa.array([0], pa.int64()),
                    "saved_ppm": pa.array([0], pa.int64()),
                }
            )
        )
    total_tokens = tok.sum("n") or 0

    def plan_padding(order_cols: tuple[str, ...]) -> int:
        """Distributed row_number over ``order_cols`` -> batch id ->
        per-batch (max, sum, count) partials -> exact padding."""
        primary = order_cols[0]
        mx = tok.max(primary) or 0

        def bucketize(batch: pa.Table) -> pa.Table:
            v = batch.column(primary).combine_chunks().to_numpy(zero_copy_only=False)
            bkt = np.clip((v * num_buckets) // (int(mx) + 1), 0, num_buckets - 1)
            return batch.append_column("bkt", pa.array(bkt.astype(np.int64)))

        bucketed = tok.map_batches(bucketize, batch_format="pyarrow").materialize()
        parts = bucketed.groupby("bkt").aggregate(Count(alias_name="c")).take_all()
        off: dict[int, int] = {}
        acc = 0
        for r in sorted(parts, key=lambda r: r["bkt"]):
            off[int(r["bkt"])] = acc
            acc += int(r["c"])
        off_ref = ray.put(off)

        def batch_partials(group: pa.Table) -> pa.Table:
            o = ray.get(off_ref)
            base = o[int(group.column("bkt")[0].as_py())]
            ids = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
            n = group.column("n").combine_chunks().to_numpy(zero_copy_only=False)
            key = n if primary == "n" else ids
            tie = ids
            order = np.lexsort((tie, key))
            rk = np.empty(len(ids), dtype=np.int64)
            rk[order] = base + np.arange(1, len(ids) + 1, dtype=np.int64)
            b = (rk - 1) // batch_size
            t = pa.table(
                {
                    "b": pa.array(b),
                    "mx": pa.array(n),
                    "sm": pa.array(n),
                    "c": pa.array(np.ones(len(ids), dtype=np.int64)),
                }
            )
            agg = pa.TableGroupBy(t, "b").aggregate(
                [("mx", "max"), ("sm", "sum"), ("c", "sum")]
            )
            return pa.table(
                {
                    "b": agg.column("b"),
                    "mx": agg.column("mx_max").cast(pa.int64()),
                    "sm": agg.column("sm_sum").cast(pa.int64()),
                    "c": agg.column("c_sum").cast(pa.int64()),
                }
            )

        per_batch = (
            bucketed.groupby("bkt")
            .map_groups(batch_partials, batch_format="pyarrow")
            .groupby("b")
            .aggregate(
                Max("mx", alias_name="mx"),
                Sum("sm", alias_name="sm"),
                Sum("c", alias_name="c"),
            )
        )

        def fold(batch: pa.Table) -> pa.Table:
            mxv = batch.column("mx").combine_chunks().to_numpy(zero_copy_only=False)
            sm = batch.column("sm").combine_chunks().to_numpy(zero_copy_only=False)
            c = batch.column("c").combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {"pad": pa.array([int((mxv * c - sm).sum())], pa.int64())}
            )

        return per_batch.map_batches(fold, batch_format="pyarrow").sum("pad") or 0

    pad_sorted = plan_padding(("n", "doc_id"))
    pad_natural = plan_padding(("doc_id",))
    saved = (pad_natural - pad_sorted) * 1_000_000 // max(pad_natural, 1)
    return rd.from_arrow(
        pa.table(
            {
                "batch_size": pa.array([batch_size], pa.int64()),
                "n_docs": pa.array([n_docs], pa.int64()),
                "n_batches": pa.array([(n_docs + batch_size - 1) // batch_size], pa.int64()),
                "total_tokens": pa.array([int(total_tokens)], pa.int64()),
                "padding_sorted": pa.array([int(pad_sorted)], pa.int64()),
                "padding_natural": pa.array([int(pad_natural)], pa.int64()),
                "saved_ppm": pa.array([int(saved)], pa.int64()),
            }
        )
    )
