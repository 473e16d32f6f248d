"""Distributed PageRank over the customer↔supplier trade graph.

PageRank (Page et al. 1999) is the canonical iterative message-passing
algorithm — the shape every link-analysis / graph-centrality job takes on
a data engine.  The graph here: customers and suppliers are nodes, with an
edge wherever a lineitem connects them (via its order); edges run BOTH
directions, so the walk has no dangling nodes and every node keeps an
in-edge (node ids: ``2·custkey`` for customers, ``2·suppkey + 1`` for
suppliers).

Everything is EXACT int64 arithmetic, so the result is bit-identical
under any batching/bucketing and has an exact unrolled-CTE SQL twin:

    s_0(v)     = 2^40
    s_{i+1}(v) = BASE + (17 · Σ_{u→v} s_i(u) // deg(u)) // 20

with ``//`` floor division (all values positive, so trunc == floor on
both sides) and ``BASE = (3 · 2^40) // 20`` — α = 17/20 = 0.85, the
classic damping.  Fixed ``iters`` rounds, no float anywhere.  Overflow
bound: total walk mass is N·2^40, so a single int64 cell is safe while
N < 2^22; at web-scale node counts the start score scales down
(S0 ≈ 2^62 / N) — same grid contract, smaller quantum.

Scale shape (Pregel-style, per round: one co-partition shuffle + one
fold — NO ``Dataset.join``, which chokes on empty shuffle partitions):

1. edge build: lineitem and orders are bucketed by ``orderkey % B``,
   unioned, and merged per bucket (sorted-side searchsorted), emitting
   distinct (cust, supp) pairs; a second hash-bucket pass dedups pairs
   globally and symmetrizes — the edge table is materialized ONCE and
   re-read every round;
2. each round is ONE co-partition shuffle: edge rows and incoming score
   rows share the ``src % B`` bucket key, so the bucket kernel resolves
   its nodes' scores (summing the previous round's contribution partials
   — the fold is FUSED into the round, not a separate shuffle), computes
   out-degrees and per-edge contributions vectorized, and emits
   bucket-combined partials keyed for the NEXT round's buckets;
3. the whole ``iters``-round chain stays lazy — one streaming execution
   end-to-end, each round's blocks consumed as the next round's input
   (per-shuffle fixed cost ~1-3 s on this host dominates small inputs,
   so rounds are kept to one exchange each).

Reference seam: the reference engine has no graph operator — this module
extends the engine the way `graph.py` (connected components) does, with
the same bucket-contraction discipline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..sources.tables import sf_table

PR_S0 = 1 << 40
PR_ALPHA_NUM = 17
PR_ALPHA_DEN = 20
PR_BASE = ((PR_ALPHA_DEN - PR_ALPHA_NUM) * PR_S0) // PR_ALPHA_DEN
PR_ITERS = 5
_PARTIAL_DST = -1  # dst sentinel: row carries a contribution partial for src
_LITERAL_DST = -2  # dst sentinel: row carries a literal (round-0) score for src


def _trade_edges(sf_dir: str, *, num_buckets: int) -> rd.Dataset:
    """Distinct symmetrized (sbkt, src, dst) edges of the trade graph."""
    li = sf_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    orders = sf_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def li_side(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "obkt": pa.array((ok % num_buckets).astype(np.int64)),
                "okey": pa.array(ok.astype(np.int64)),
                "cust": pa.array(np.full(len(ok), -1, np.int64)),
                "supp": batch.column("l_suppkey").cast(pa.int64()),
            }
        )

    def ord_side(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "obkt": pa.array((ok % num_buckets).astype(np.int64)),
                "okey": pa.array(ok.astype(np.int64)),
                "cust": batch.column("o_custkey").cast(pa.int64()),
                "supp": pa.array(np.full(len(ok), -1, np.int64)),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        cust = group.column("cust").combine_chunks().to_numpy(zero_copy_only=False)
        supp = group.column("supp").combine_chunks().to_numpy(zero_copy_only=False)
        okey = group.column("okey").combine_chunks().to_numpy(zero_copy_only=False)
        is_ord = supp == -1
        o_k, o_c = okey[is_ord], cust[is_ord]
        l_k, l_s = okey[~is_ord], supp[~is_ord]
        if not len(o_k):
            if len(l_k):
                raise ValueError("lineitem rows with no matching order")
            return pa.table({"c": pa.array([], pa.int64()), "s": pa.array([], pa.int64())})
        order = np.argsort(o_k, kind="stable")
        o_k, o_c = o_k[order], o_c[order]
        pos = np.searchsorted(o_k, l_k)
        ok = (pos < len(o_k)) & (o_k[np.minimum(pos, len(o_k) - 1)] == l_k)
        if not ok.all():
            raise ValueError("lineitem row with no matching order")
        pair = np.unique(
            np.stack([o_c[pos], l_s], axis=1), axis=0
        )  # distinct (cust, supp) of this order bucket
        return pa.table(
            {"c": pa.array(pair[:, 0]), "s": pa.array(pair[:, 1])}
        )

    pairs = (
        li.map_batches(li_side, batch_format="pyarrow")
        .union(orders.map_batches(ord_side, batch_format="pyarrow"))
        .groupby("obkt")
        .map_groups(merge, batch_format="pyarrow")
    )

    def symmetrize(batch: pa.Table) -> pa.Table:
        c = batch.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        s = batch.column("s").combine_chunks().to_numpy(zero_copy_only=False)
        src = np.concatenate([2 * c, 2 * s + 1])
        dst = np.concatenate([2 * s + 1, 2 * c])
        pbkt = ((src * np.int64(1_000_003) + dst) % num_buckets).astype(np.int64)
        return pa.table({"pbkt": pa.array(pbkt), "src": pa.array(src), "dst": pa.array(dst)})

    def distinct(group: pa.Table) -> pa.Table:
        src = group.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        dst = group.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        e = np.unique(np.stack([src, dst], axis=1), axis=0)
        return pa.table(
            {
                "sbkt": pa.array((e[:, 0] % num_buckets).astype(np.int64)),
                "src": pa.array(e[:, 0]),
                "dst": pa.array(e[:, 1]),
                "s": pa.array(np.zeros(len(e), np.int64)),
            }
        )

    return (
        pairs.map_batches(symmetrize, batch_format="pyarrow")
        .groupby("pbkt")
        .map_groups(distinct, batch_format="pyarrow")
    )


def trade_pagerank(
    sf_dir: str, *, iters: int = PR_ITERS, num_buckets: int = 32
) -> rd.Dataset:
    """``iters`` exact-integer PageRank rounds over the trade graph.

    Returns every node as (kind, node_key, score) — kind ∈ {customer,
    supplier}, score the int64 fixed-point rank — sorted by (kind,
    node_key).  Bit-identical for any ``num_buckets``.
    """
    edges = _trade_edges(sf_dir, num_buckets=num_buckets).materialize()
    # post-groupby blocks are bucket-count tiny shards; every round re-reads
    # this set, so pay one metadata-cheap compaction up front (the
    # graph.py / dedup.py small-links pattern)
    if edges.count() < 2_000_000:
        edges = edges.repartition(4).materialize()

    def init_scores(batch: pa.Table) -> pa.Table:
        # per-block distinct srcs as LITERAL score rows; a node seen in
        # several blocks emits duplicate literals — the round kernel
        # dedups them (same value by construction)
        src = np.unique(batch.column("src").combine_chunks().to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "sbkt": pa.array((src % num_buckets).astype(np.int64)),
                "src": pa.array(src),
                "dst": pa.array(np.full(len(src), _LITERAL_DST, np.int64)),
                "s": pa.array(np.full(len(src), PR_S0, np.int64)),
            }
        )

    scores = edges.map_batches(init_scores, batch_format="pyarrow")

    def _resolve(group: pa.Table):
        """Split a bucket group into (edge arrays, resolved per-node scores).

        Score resolution: literal rows win (round 0; duplicates carry the
        same value); otherwise a node's score is BASE + (17·Σ partials)//20
        — the fused fold."""
        src = group.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        dst = group.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        s = group.column("s").combine_chunks().to_numpy(zero_copy_only=False)
        is_lit = dst == _LITERAL_DST
        is_part = dst == _PARTIAL_DST
        is_edge = ~(is_lit | is_part)
        if is_lit.any():
            sn, first = np.unique(src[is_lit], return_index=True)
            sv = s[is_lit][first]
        else:
            pn, pv = src[is_part], s[is_part]
            order = np.argsort(pn, kind="stable")
            spn = pn[order]
            new = np.concatenate([[True], spn[1:] != spn[:-1]]) if len(spn) else np.array([], bool)
            starts = np.nonzero(new)[0]
            sn = spn[starts]
            tot = np.add.reduceat(pv[order], starts) if len(starts) else pv
            sv = PR_BASE + (PR_ALPHA_NUM * tot) // PR_ALPHA_DEN
        return src[is_edge], dst[is_edge], sn, sv

    def round_kernel(group: pa.Table) -> pa.Table:
        esrc, edst, sn, sv = _resolve(group)
        if not len(esrc):
            return pa.table(
                {
                    "sbkt": pa.array([], pa.int64()),
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        pos = np.searchsorted(sn, esrc)
        if (pos >= len(sn)).any() or (sn[pos] != esrc).any():
            raise ValueError("edge source without a score row in its bucket")
        # out-degree per distinct src (all out-edges co-located here)
        _, inv, cnt = np.unique(esrc, return_inverse=True, return_counts=True)
        contrib = sv[pos] // cnt[inv]
        # bucket-combine partials per destination before the shuffle
        order = np.argsort(edst, kind="stable")
        sd = edst[order]
        new = np.concatenate([[True], sd[1:] != sd[:-1]])
        starts = np.nonzero(new)[0]
        node = sd[starts]
        tot = np.add.reduceat(contrib[order], starts)
        return pa.table(
            {
                "sbkt": pa.array((node % num_buckets).astype(np.int64)),
                "src": pa.array(node),
                "dst": pa.array(np.full(len(node), _PARTIAL_DST, np.int64)),
                "s": pa.array(tot),
            }
        )

    for _ in range(iters):
        scores = (
            edges.union(scores).groupby("sbkt").map_groups(round_kernel, batch_format="pyarrow")
        )

    def present(group: pa.Table) -> pa.Table:
        _, _, sn, sv = _resolve(group)
        kind = np.where(sn % 2 == 0, "customer", "supplier")
        return pa.table(
            {
                "kind": pa.array(kind.astype(object), pa.string()),
                "node_key": pa.array(sn // 2),
                "score": pa.array(sv),
            }
        )

    # partials already carry their node's bucket — no edges needed to resolve
    return (
        scores.groupby("sbkt")
        .map_groups(present, batch_format="pyarrow")
        .sort(["kind", "node_key"])
    )


PPR_SCALE = 1_000_000_000_000  # seed mass in fixed-point units
PPR_ITERS = 30
PPR_SEEDS = 4
PPR_TOPK = 10


def _rdiv_even_vec(n: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Vectorized round-half-even integer division (d > 0) — the
    fixed-point kernel shared by spec with the sequential oracle."""
    q, r = np.divmod(n, d)
    up = (2 * r > d) | ((2 * r == d) & (q % 2 == 1))
    return q + up.astype(np.int64)


def ppr_recommendations(
    sf_dir: str,
    *,
    min_support: int = 2,
    num_buckets: int = 64,
    num_seeds: int = PPR_SEEDS,
    iters: int = PPR_ITERS,
    top_k: int = PPR_TOPK,
) -> pa.Table:
    """Personalized PageRank (random walk with restart, α = 0.15) on the
    co-purchase graph — the classic item-to-item recommendation score —
    in EXACT INTEGER FIXED-POINT so the whole iteration is
    bit-reproducible: seed mass ``10^12`` units, per-node outflow
    ``rdiv(85·x_u, 100·deg_u)`` (half-even — each in-edge of u receives
    the identical integer, so inflow sums are order-free), restart
    ``rdiv(15·10^12, 100)`` to the seed each round, ``iters`` fixed
    rounds (the LPA determinism contract).

    Distribution axis: seeds are embarrassingly parallel over a
    broadcast CSR (the `betweenness_digest` regime — adjacency fits a
    worker; the `trade_pagerank` bucket-sharded rounds are the beyond-
    RAM alternative).  Returns (seed, rank, node, score) — each seed's
    ``top_k`` non-seed nodes by (score desc, node asc).  Gated via
    `ppr_digest`, pinned from `oracle_dedup.ppr_rows`.
    """
    from .basket import copurchase_edges
    from .joins import _get_broadcast

    edges = copurchase_edges(sf_dir, min_support=min_support, num_buckets=num_buckets)
    rows = edges.take_all()  # graph-sized: the broadcast-regime trade
    empty = pa.table(
        {
            "seed": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "node": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
        }
    )
    if not rows:
        return empty
    a = np.array([r["p1"] for r in rows], dtype=np.int64)
    b = np.array([r["p2"] for r in rows], dtype=np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    nodes = np.unique(src)
    pos = {int(v): i for i, v in enumerate(nodes.tolist())}
    si = np.fromiter((pos[int(v)] for v in src), dtype=np.int64, count=len(src))
    di = np.fromiter((pos[int(v)] for v in dst), dtype=np.int64, count=len(dst))
    deg = np.bincount(si, minlength=len(nodes)).astype(np.int64)
    adj_ref = ray.put((nodes, si, di, deg))
    seeds = [int(v) for v in nodes[:num_seeds].tolist()]

    def walk(batch: pa.Table) -> pa.Table:
        nodes_, si_, di_, deg_ = _get_broadcast(adj_ref)
        n = len(nodes_)
        restart = 15 * PPR_SCALE // 100  # exact: no remainder
        out = {"seed": [], "rank": [], "node": [], "score": []}
        for sd in batch.column("seed").to_pylist():
            s_ix = int(np.searchsorted(nodes_, sd))
            x = np.zeros(n, dtype=np.int64)
            x[s_ix] = PPR_SCALE
            for _ in range(iters):
                t = _rdiv_even_vec(85 * x, 100 * deg_)
                nx = np.zeros(n, dtype=np.int64)
                np.add.at(nx, di_, t[si_])
                nx[s_ix] += restart
                x = nx
            order = np.lexsort((nodes_, -x))
            taken = 0
            for i in order.tolist():
                if i == s_ix or x[i] <= 0:
                    continue
                taken += 1
                out["seed"].append(sd)
                out["rank"].append(taken)
                out["node"].append(int(nodes_[i]))
                out["score"].append(int(x[i]))
                if taken >= top_k:
                    break
        return pa.table(
            {
                "seed": pa.array(out["seed"], pa.int64()),
                "rank": pa.array(out["rank"], pa.int64()),
                "node": pa.array(out["node"], pa.int64()),
                "score": pa.array(out["score"], pa.int64()),
            }
        )

    piv = rd.from_arrow(pa.table({"seed": pa.array(seeds, pa.int64())}))
    t = (
        piv.repartition(len(seeds))
        .map_batches(walk, batch_format="pyarrow")
        .take_all()  # seeds × top_k rows
    )
    t = sorted(t, key=lambda r: (r["seed"], r["rank"]))
    return pa.table(
        {
            "seed": pa.array([r["seed"] for r in t], pa.int64()),
            "rank": pa.array([r["rank"] for r in t], pa.int64()),
            "node": pa.array([r["node"] for r in t], pa.int64()),
            "score": pa.array([r["score"] for r in t], pa.int64()),
        }
    )


def ppr_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `ppr_recommendations`: (n_rows, digest)."""
    from .interpret import DIGEST_MOD, row_digest

    t = ppr_recommendations(sf_dir)
    dg = 0
    for i in range(t.num_rows):
        key = f"{t.column('seed')[i].as_py()}\x1f{t.column('rank')[i].as_py()}"
        pay = f"{t.column('node')[i].as_py()}\x1f{t.column('score')[i].as_py()}"
        dg = (dg + row_digest(key, pay)) % DIGEST_MOD
    return pa.table(
        {
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


HITS_SCALE = 1_000_000_000_000  # per-side score mass after renormalization
HITS_ITERS = 4


def trade_hits(
    sf_dir: str, *, iters: int = HITS_ITERS, num_buckets: int = 32
) -> rd.Dataset:
    """HITS hubs & authorities (Kleinberg 1999) on the BIPARTITE trade
    graph: customers are hubs, suppliers are authorities, with a directed
    edge customer→supplier per distinct trading pair (via lineitem⋈orders —
    the same edge build as `trade_pagerank`, filtered to the c→s
    direction).

    EXACT INTEGER fixed-point so the result is bit-identical under any
    bucketing: each half-round pushes raw int64 scores along the edges,
    folds per-destination sums, and renormalizes the side to total mass
    ``HITS_SCALE`` with half-even division —

        a'(s)   = Σ_{c→s} h(c)         a(s) = rdiv(a'(s)·10^12, Σ a')
        h'(c)   = Σ_{c→s} a(s)         h(c) = rdiv(h'(c)·10^12, Σ h')

    starting from h_0(c) = 10^6 (the first renormalization makes the
    start level irrelevant beyond the grid).  Overflow bound: a side's
    pushed mass is ≤ 10^12 · max-degree, safe in int64 while the hottest
    node keeps < ~9·10^6 distinct partners; at web scale the mass
    constant scales down (same grid contract as PR_S0).

    Scale shape — Pregel with a PER-HALF-ROUND SCALAR AGGREGATOR: each
    half-round is one co-partition push shuffle (edges ∪ score rows
    share the src bucket) + one per-destination fold shuffle, then the
    side total — a single driver scalar via ``Dataset.sum`` — feeds the
    renormalization map.  The materialize-per-half-round is inherent to
    normalized HITS (the global sum is a sequential dependency), and
    each materialized state is one int64 row per node, never edges.

    Returns (kind, node_key, score): hub scores for customers, authority
    scores for suppliers, sorted by (kind, node_key).  Digest-gated via
    `hits_digest`, pinned from the independent sequential
    `oracle_dedup.hits_rows`.
    """
    edges = (
        _trade_edges(sf_dir, num_buckets=num_buckets)
        .map_batches(
            lambda b: b.filter(
                pc.equal(pc.bit_wise_and(b.column("src"), 1), 0)
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "kind": pa.array([], pa.string()),
                    "node_key": pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                }
            )
        )
    # reversed edge set for the hub half-round, keyed by ITS src (= supplier)
    def rev(batch: pa.Table) -> pa.Table:
        src = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "sbkt": pa.array((src % num_buckets).astype(np.int64)),
                "src": pa.array(src),
                "dst": batch.column("src"),
                "s": pa.array(np.zeros(len(src), np.int64)),
            }
        )

    edges_rev = edges.map_batches(rev, batch_format="pyarrow").materialize()
    if edges.count() < 2_000_000:
        edges = edges.repartition(4).materialize()
        edges_rev = edges_rev.repartition(4).materialize()

    def init_scores(batch: pa.Table) -> pa.Table:
        src = np.unique(
            batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "sbkt": pa.array((src % num_buckets).astype(np.int64)),
                "src": pa.array(src),
                "dst": pa.array(np.full(len(src), _LITERAL_DST, np.int64)),
                "s": pa.array(np.full(len(src), 1_000_000, np.int64)),
            }
        )

    def push(group: pa.Table) -> pa.Table:
        """One src bucket: resolve literal scores (dupes carry the same
        value), push score[src] along each edge, bucket-combine per dst."""
        src = group.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        dst = group.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        s = group.column("s").combine_chunks().to_numpy(zero_copy_only=False)
        is_lit = dst == _LITERAL_DST
        is_edge = ~is_lit
        sn, first = np.unique(src[is_lit], return_index=True)
        sv = s[is_lit][first]
        esrc, edst = src[is_edge], dst[is_edge]
        if not len(esrc):
            return pa.table(
                {
                    "fbkt": pa.array([], pa.int64()),
                    "node": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        pos = np.searchsorted(sn, esrc)
        if (pos >= len(sn)).any() or (sn[np.minimum(pos, len(sn) - 1)] != esrc).any():
            raise ValueError("edge source without a score row in its bucket")
        contrib = sv[pos]
        order = np.argsort(edst, kind="stable")
        sd = edst[order]
        new = np.concatenate([[True], sd[1:] != sd[:-1]])
        starts = np.nonzero(new)[0]
        node = sd[starts]
        tot = np.add.reduceat(contrib[order], starts)
        return pa.table(
            {
                "fbkt": pa.array((node % num_buckets).astype(np.int64)),
                "node": pa.array(node),
                "s": pa.array(tot),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        node = group.column("node").combine_chunks().to_numpy(zero_copy_only=False)
        s = group.column("s").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        sn = node[order]
        new = np.concatenate([[True], sn[1:] != sn[:-1]]) if len(sn) else np.array([], bool)
        starts = np.nonzero(new)[0]
        out = sn[starts]
        tot = np.add.reduceat(s[order], starts) if len(starts) else s
        return pa.table({"node": pa.array(out), "s": pa.array(tot)})

    def half_round(score_rows: rd.Dataset, edge_side: rd.Dataset) -> rd.Dataset:
        raw = (
            edge_side.union(score_rows)
            .groupby("sbkt")
            .map_groups(push, batch_format="pyarrow")
            .groupby("fbkt")
            .map_groups(fold, batch_format="pyarrow")
            .materialize()
        )
        total = int(raw.sum("s"))

        def rescale(batch: pa.Table) -> pa.Table:
            node = batch.column("node").combine_chunks().to_numpy(zero_copy_only=False)
            s = batch.column("s").combine_chunks().to_numpy(zero_copy_only=False)
            # Python-int numerators: s·10^12 overflows int64 (s itself can
            # reach mass × degree); the loop is node-count sized per block.
            def rdiv(n: int, d: int) -> int:
                q, r = divmod(n, d)
                if 2 * r > d or (2 * r == d and q % 2 == 1):
                    q += 1
                return q

            scaled = np.fromiter(
                (rdiv(int(x) * HITS_SCALE, total) for x in s),
                dtype=np.int64,
                count=len(s),
            )
            return pa.table(
                {
                    "sbkt": pa.array((node % num_buckets).astype(np.int64)),
                    "src": pa.array(node),
                    "dst": pa.array(np.full(len(node), _LITERAL_DST, np.int64)),
                    "s": pa.array(scaled),
                }
            )

        out = raw.map_batches(rescale, batch_format="pyarrow")
        # score rows are node-count sized and re-enter the NEXT half-round's
        # push exchange: compact the 64 near-empty fold blocks (count-guarded
        # — at web scale the block count stays natural)
        if total and raw.count() < 2_000_000:
            out = out.repartition(4)
        return out.materialize()

    hubs = edges.map_batches(init_scores, batch_format="pyarrow").materialize()
    auths = None
    for _ in range(iters):
        auths = half_round(hubs, edges)
        hubs = half_round(auths, edges_rev)

    def present(batch: pa.Table) -> pa.Table:
        n = batch.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        kind = np.where(n % 2 == 0, "customer", "supplier")
        return pa.table(
            {
                "kind": pa.array(kind.astype(object), pa.string()),
                "node_key": pa.array(n // 2),
                "score": batch.column("s"),
            }
        )

    return (
        hubs.union(auths)
        .map_batches(present, batch_format="pyarrow")
        .sort(["kind", "node_key"])
    )


def hits_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `trade_hits`: (n_nodes, digest), pinned from the
    independent sequential `oracle_dedup.hits_rows`."""
    from .interpret import DIGEST_MOD, row_digest

    t = trade_hits(sf_dir).to_arrow_refs()
    import ray as _ray

    dg = 0
    n_rows = 0
    for ref in t:
        tb = _ray.get(ref)
        for i in range(tb.num_rows):
            key = f"{tb.column('kind')[i].as_py()}\x1f{tb.column('node_key')[i].as_py()}"
            dg = (dg + row_digest(key, str(tb.column("score")[i].as_py()))) % DIGEST_MOD
            n_rows += 1
    return pa.table(
        {
            "n_nodes": pa.array([n_rows], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )
