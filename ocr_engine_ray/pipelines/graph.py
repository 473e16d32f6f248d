"""Distributed connected components — the on-cluster clustering tail for
the near-dup dedup pipelines (MinHash/SimHash).

The candidate-pair edge set stays a ``ray.data.Dataset`` end-to-end — no
driver-side ``take_all`` + union-find.  Each round hash-buckets the link
rows (alternating by node / by label) and contracts every bucket with an
in-task union-find, so a chain or clique that lands in one bucket collapses
in a single round; the driver sees only a (row-count, label-sum) scalar pair
per round as the convergence witness.

At 10^12-doc scale every round's shuffle moves only the edge set (candidate
pairs), orders of magnitude smaller than the corpus — the documented
assumption of LSH dedup (banding already capped per-bucket fan-out
upstream).

Note: the dedup verification path deliberately avoids ``Dataset.join`` —
the native JoinOperator's per-partition Acero join rejects list-typed
payload columns and chokes on the schema-less empty blocks that groupby
aggregates emit for empty shuffle partitions (observed at num_cpus=16).
Everything here is union + groupby, which is immune to both.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


# ---------------------------------------------------------------------------
# Connected components (alternating per-bucket contraction, "hash-to-min")
# ---------------------------------------------------------------------------


def empty_clusters() -> rd.Dataset:
    """Typed empty (doc_id, cluster_id) result."""
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
            }
        )
    )


def _edges_to_links(batch: pa.Table) -> pa.Table:
    """Symmetrize edges into link rows so that bucketing by ``node``
    co-locates every incident edge of a node."""
    fwd = pa.table({"node": batch["a"], "label": batch["b"]})
    rev = pa.table({"node": batch["b"], "label": batch["a"]})
    return pa.concat_tables([fwd, rev]).combine_chunks()


def _add_bkt(batch: pa.Table, *, num_buckets: int) -> pa.Table:
    kv = batch["node"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "node": batch["node"],
            "label": batch["label"],
            "_bkt": pa.array(kv % num_buckets, pa.int64()),
        }
    )


def _uf_bucket(group: pa.Table) -> pa.Table:
    """Contract one bucket's (node, label) link rows to its star forest —
    root = MIN id of the bucket-local component — and emit it SYMMETRIZED:
    (x → root) for every element seen plus the reverse (root → x) rows.
    The reverse rows are what let the min root travel back out through the
    root's bucket next round (hash-to-min), so cross-bucket chains converge
    in O(log n) rounds instead of O(n).

    Fully vectorized (the per-row Python union-find was the last per-row
    loop in a contraction kernel): ids localize via np.unique, then
    alternating edge-relax (``np.minimum.at`` of each endpoint's current
    label onto the other) and pointer-doubling sweeps run O(E) numpy work
    per sweep and converge in O(log n) sweeps for any topology — the same
    canonical min-root forest the union-find produced, verified by the
    equality property test and the pinned cluster digests."""
    na_in = group["node"].combine_chunks().to_numpy(zero_copy_only=False)
    la_in = group["label"].combine_chunks().to_numpy(zero_copy_only=False)
    ids = np.unique(np.concatenate([na_in, la_in]))
    n = len(ids)
    if n == 0:
        na = np.array([], dtype=np.int64)
        return pa.table(
            {
                "node": pa.array(na),
                "label": pa.array(na),
                "h": pa.array(_link_hash(na, na)),
            }
        )
    ei = np.searchsorted(ids, na_in)
    ej = np.searchsorted(ids, la_in)
    parent = np.arange(n, dtype=np.int64)
    while True:
        prev = parent
        parent = parent.copy()
        # edge relax: each endpoint adopts the other's current label if lower
        np.minimum.at(parent, ei, prev[ej])
        np.minimum.at(parent, ej, prev[ei])
        # pointer doubling: labels jump toward their component minimum
        parent = np.minimum(parent, parent[parent])
        parent = np.minimum(parent, parent[parent])
        if np.array_equal(parent, prev):
            break
    roots = ids[parent]
    rev = roots != ids  # reverse rows for non-root members
    na = np.concatenate([ids, roots[rev]])
    la = np.concatenate([roots, ids[rev]])
    # interleave to match the canonical (x→root, then root→x) row order per
    # sorted x — the digest witness is order-independent, but keep the
    # output deterministic anyway: sort rows by (node-position) via one
    # lexsort on (reverse-flag, x)
    order = np.lexsort(
        (
            np.concatenate([np.zeros(n, np.int64), np.ones(int(rev.sum()), np.int64)]),
            np.concatenate([ids, ids[rev]]),
        )
    )
    na = na[order]
    la = la[order]
    return pa.table(
        {
            "node": pa.array(na),
            "label": pa.array(la),
            "h": pa.array(_link_hash(na, la)),
        }
    )


def _link_hash(node: np.ndarray, label: np.ndarray) -> np.ndarray:
    """40-bit order-independent row hash for the convergence witness.  The
    driver compares sum-of-hashes (+ row count) across rounds: a multiset
    change that preserves both is a ~2^-40 accident, unlike the old
    (count, label-sum) pair which distinct non-fixpoint link sets can share.
    40 bits (not 64) so per-block int64 partial sums can never wrap — a wrap
    in pyarrow but not in the Python combine would make the witness depend
    on block boundaries."""
    mixed = (node.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
        label.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
    )
    mixed ^= mixed >> np.uint64(29)
    return (mixed & np.uint64(0xFF_FFFF_FFFF)).astype(np.int64)


def _as_clusters(batch: pa.Table) -> pa.Table:
    return pa.table({"doc_id": batch["node"], "cluster_id": batch["label"]})


def connected_components(
    edges: rd.Dataset,
    *,
    rows_per_bucket: int = 2_000_000,
    max_rounds: int = 24,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """``(a, b)`` int64 edge Dataset → ``(doc_id, cluster_id)`` Dataset where
    ``cluster_id`` is the minimum node id of the node's connected component.

    Algorithm: symmetrized local contraction (hash-to-min flavored).  Link
    rows (node → label, both edge directions) are hash-bucketed by node and
    each bucket runs an in-task union-find emitting its star forest plus the
    reverse rows.  A bucket collapses every chain/clique it sees in ONE
    round (unlike pure min-label propagation, which needs diameter rounds),
    and the reverse rows carry min labels back out across buckets, so
    rounds = O(log n) on adversarial chains (measured: 7 rounds for a 10k
    chain at 16 buckets) and 2 with the edge set in a single bucket.
    ``rows_per_bucket`` is the scale knob: bucket count = ⌈links / it⌉,
    sized so one bucket's union-find state fits a worker heap.  The edge set
    stays a Dataset end-to-end — the driver sees only (row-count, label-sum)
    pairs, the monotone convergence witness.  ``num_partitions`` forces the
    bucket count (used by tests to exercise the multi-bucket path).
    """
    links = edges.map_batches(_edges_to_links, batch_format="pyarrow").materialize()
    n = links.count()
    if n == 0:
        return empty_clusters()
    nbuckets = num_partitions or max(1, math.ceil(n / rows_per_bucket))
    # Compact a small link set inherited as many near-empty blocks (one per
    # upstream shuffle partition): each contraction round shuffles it again,
    # and tiny blocks make the round's fixed cost dominate.  Metadata-only
    # checks; skipped at scale.
    if n < 1_000_000 and links.num_blocks() > max(8, 4 * nbuckets):
        links = links.repartition(max(4, nbuckets)).materialize()

    def contract(ds: rd.Dataset) -> rd.Dataset:
        return (
            ds.map_batches(
                _add_bkt,
                batch_format="pyarrow",
                fn_kwargs={"num_buckets": nbuckets},
            )
            .groupby("_bkt")
            .map_groups(_uf_bucket, batch_format="pyarrow")
        )

    if nbuckets == 1:
        # One bucket sees every edge: a single union-find round IS the final
        # star forest — no confirmation round, no convergence scalars.
        links = contract(links)
    else:
        prev: tuple[int, int] | None = None
        converged = False
        for _ in range(max_rounds):
            links = contract(links).materialize()
            # Content witness: (row count, sum of per-row 40-bit hashes).
            # Contraction is a deterministic function of the link multiset,
            # so an unchanged multiset IS a fixpoint; count() on the
            # materialized set is free (metadata), sum("h") is one pass.
            stats = (links.count(), int(links.sum("h")))
            if stats == prev:
                converged = True
                break
            prev = stats
        if not converged:
            raise RuntimeError(
                f"connected_components did not reach a fixpoint in "
                f"{max_rounds} rounds (witness {prev}); raise max_rounds or "
                f"lower rows_per_bucket"
            )

    # per-node label fold via the shared hash-bucket reduceat fold: Ray's
    # per-key Min aggregate pays per-distinct-node machinery (the measured
    # 40x doc-fold hotspot, fold.py); min is the same commutative exact
    # integer reduction whichever path.
    from .fold import fold_by_key

    return fold_by_key(
        links, key="node", cols=["label"], ops=["min"]
    ).map_batches(_as_clusters, batch_format="pyarrow")


def kcore_members(
    sf_dir: str,
    *,
    k: int = 2,
    min_support: int = 2,
    num_buckets: int = 64,
    max_iters: int = 64,
) -> rd.Dataset:
    """The k-CORE of the co-purchase graph: the maximal subgraph where
    every node keeps degree ≥ k — the density filter that strips dangling
    tendrils before community analysis (complements `connected_components`
    / `trade_pagerank` / `basket.triangle_count` in the graph family).

    Iterative peel, each round ONE endpoint-groupby over the current edge
    set: degrees → survivors (deg ≥ k) → edge filter.  The surviving node
    set is monotone decreasing, so the loop terminates in ≤ |nodes| rounds
    (capped at ``max_iters`` with a loud raise — the CC convergence-witness
    convention).  The survivor list broadcast per round is part-catalog-
    sized (graph nodes are parts — dimension-sized, the same budget as the
    broadcast-join dims); the edge set shrinks monotonically and only its
    narrow (p1, p2) projection is ever pinned.

    Returns (node, deg_in_core) sorted by node — degree WITHIN the core,
    recomputed on the fixpoint edge set.  Oracle: pinned digest from the
    independent sequential `oracle_dedup.kcore_nodes` (gate:
    ``kcore_digest``).
    """
    import ray

    from .basket import copurchase_edges

    edges = copurchase_edges(sf_dir, min_support=min_support, num_buckets=num_buckets)

    def endpoints(batch: pa.Table) -> pa.Table:
        p1 = batch.column("p1").combine_chunks().to_numpy(zero_copy_only=False)
        p2 = batch.column("p2").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([p1, p2]))})

    def degree_table(es: rd.Dataset) -> list:
        from ray.data.aggregate import Count

        return (
            es.map_batches(endpoints, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Count(alias_name="deg"))
            .take_all()
        )

    prev_edges = edges.count()
    for it in range(max_iters):
        degs = degree_table(edges)
        survivors = np.array(
            sorted(r["node"] for r in degs if r["deg"] >= k), dtype=np.int64
        )
        if len(survivors) == 0:
            return rd.from_arrow(
                pa.table(
                    {"node": pa.array([], pa.int64()), "deg_in_core": pa.array([], pa.int64())}
                )
            )
        ref = ray.put(survivors)

        def keep_edges(batch: pa.Table, *, ref) -> pa.Table:
            s = ray.get(ref)
            p1 = batch.column("p1").combine_chunks().to_numpy(zero_copy_only=False)
            p2 = batch.column("p2").combine_chunks().to_numpy(zero_copy_only=False)
            m = np.isin(p1, s) & np.isin(p2, s)
            return batch.filter(pa.array(m))

        edges = edges.map_batches(
            keep_edges, batch_format="pyarrow", fn_kwargs={"ref": ref}
        ).materialize()
        n = edges.count()
        if n == prev_edges:
            # fixpoint: every remaining endpoint has deg >= k
            final = degree_table(edges)
            out = sorted((r["node"], r["deg"]) for r in final)
            return rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array([a for a, _ in out], pa.int64()),
                        "deg_in_core": pa.array([d for _, d in out], pa.int64()),
                    }
                )
            )
        prev_edges = n
    raise RuntimeError(
        f"kcore_members did not converge in {max_iters} iterations "
        f"(edges={prev_edges}); raise max_iters"
    )


def kcore_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `kcore_members` (oracle: oracle_dedup.kcore_nodes,
    pinned-literal pattern)."""
    from .interpret import fold_digest

    ds = kcore_members(sf_dir, **kwargs)

    def payload(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["node"],
                "payload": pa.array(
                    [str(c) for c in batch["deg_in_core"].to_pylist()], pa.string()
                ),
            }
        )

    return fold_digest(ds.map_batches(payload, batch_format="pyarrow"), "payload")

BFS_MAX_ROUNDS = 16
BFS_SHARDS = 16


@ray.remote
class _BfsShard:
    """One shard of the Pregel-style BFS index: owns the adjacency rows
    whose SOURCE endpoint hashes to this shard (``src % num_shards``) and
    the hop labels of exactly those nodes.  The adjacency loads ONCE and
    never moves again — each superstep exchanges only frontier-sized
    node arrays between shards via the object store (the driver routes
    refs, never data).  This is the raw-actor escape hatch the Dataset
    API cannot express: a static distributed index probed iteratively.
    """

    def __init__(self, shard_id: int, num_shards: int) -> None:
        self.shard_id = shard_id
        self.num_shards = num_shards
        self._src_parts: list[np.ndarray] = []
        self._dst_parts: list[np.ndarray] = []
        self.src = np.array([], dtype=np.int64)
        self.dst = np.array([], dtype=np.int64)
        self.dist: dict[int, int] = {}

    def load(self, src: np.ndarray, dst: np.ndarray) -> None:
        self._src_parts.append(src)
        self._dst_parts.append(dst)

    def seal(self):
        """Sort-index the loaded adjacency; return (max_degree, min_id
        among max-degree nodes) for the deterministic global seed pick."""
        if self._src_parts:
            src = np.concatenate(self._src_parts)
            dst = np.concatenate(self._dst_parts)
            order = np.argsort(src, kind="stable")
            self.src, self.dst = src[order], dst[order]
            self._src_parts, self._dst_parts = [], []
        if not len(self.src):
            return None
        verts, counts = np.unique(self.src, return_counts=True)
        dmax = int(counts.max())
        return (dmax, int(verts[counts == dmax].min()))

    def start(self, seed: int) -> list[np.ndarray]:
        """Superstep 0: claim the seed if owned; return per-shard
        neighbor arrays (empty list if the seed lives elsewhere)."""
        if seed % self.num_shards != self.shard_id:
            return [np.array([], dtype=np.int64)] * self.num_shards
        self.dist[seed] = 0
        return self._neighbors_of(np.array([seed], dtype=np.int64))

    def step(self, hop: int, *frontier_parts: np.ndarray) -> list[np.ndarray]:
        """One superstep: claim unvisited arrivals at ``hop``, return
        their neighbors sliced by destination shard."""
        cand = (
            np.unique(np.concatenate(frontier_parts))
            if frontier_parts
            else np.array([], dtype=np.int64)
        )
        fresh = np.array(
            [n for n in cand.tolist() if n not in self.dist], dtype=np.int64
        )
        for n in fresh.tolist():
            self.dist[n] = hop
        return self._neighbors_of(fresh)

    def _neighbors_of(self, nodes: np.ndarray) -> list[np.ndarray]:
        if not len(nodes) or not len(self.src):
            return [np.array([], dtype=np.int64)] * self.num_shards
        lo = np.searchsorted(self.src, nodes, side="left")
        hi = np.searchsorted(self.src, nodes, side="right")
        spans = [self.dst[a:b] for a, b in zip(lo, hi) if b > a]
        if not spans:
            return [np.array([], dtype=np.int64)] * self.num_shards
        nbr = np.unique(np.concatenate(spans))
        owner = nbr % self.num_shards
        return [nbr[owner == b] for b in range(self.num_shards)]

    def histogram(self) -> dict[int, int]:
        out: dict[int, int] = {}
        for h in self.dist.values():
            out[h] = out.get(h, 0) + 1
        return out


def bfs_hops(
    sf_dir: str,
    *,
    min_support: int = 2,
    num_buckets: int = 64,
    num_shards: int = BFS_SHARDS,
    max_rounds: int = BFS_MAX_ROUNDS,
) -> rd.Dataset:
    """Hop-distance histogram of the co-purchase graph from its
    highest-degree part (ties by smallest id) — single-source BFS, the
    remaining classic in the graph family (CC answers "which component",
    k-core "how dense", PageRank "how central"; BFS answers "how far").

    Pregel-style supersteps over an actor-sharded adjacency index: the
    symmetrized edge set partitions ONCE by source endpoint into
    ``num_shards`` stateful actors (pushed worker→actor through the
    object store inside ``map_batches`` — the driver never touches edge
    data); each round exchanges only frontier-sized node arrays between
    shards, so round cost is O(frontier), not O(E) — the groupby-join
    BFS alternative re-co-partitions the full static adjacency with the
    dist table EVERY round (measured 335 s vs ~3 s at 8x gate scale).
    Terminates when every frontier empties (exact — level-synchronous
    BFS visits each node at its minimal hop); raises LOUDLY past
    ``max_rounds``, the recursion bound mirrored in the twin's
    ``hop < 15`` recursive CTE guard.

    Unreached parts are absent (the recursive twin never visits them).
    Returns (hop, n_parts) sorted by hop.
    """
    from .basket import copurchase_edges

    edges = copurchase_edges(
        sf_dir, min_support=min_support, num_buckets=num_buckets
    )
    shards = [_BfsShard.remote(i, num_shards) for i in range(num_shards)]

    def push(batch: pa.Table) -> pa.Table:
        a = batch.column("p1").to_numpy(zero_copy_only=False)
        b = batch.column("p2").to_numpy(zero_copy_only=False)
        src = np.concatenate([a, b]).astype(np.int64)
        dst = np.concatenate([b, a]).astype(np.int64)
        owner = src % num_shards
        refs = [
            shards[s].load.remote(src[owner == s], dst[owner == s])
            for s in range(num_shards)
            if (owner == s).any()
        ]
        ray.get(refs)  # backpressure: the batch is loaded before moving on
        return pa.table({"n": pa.array([len(src)], pa.int64())})

    loaded = edges.map_batches(push, batch_format="pyarrow").sum("n") or 0
    if not loaded:
        [ray.kill(s) for s in shards]
        return rd.from_arrow(
            pa.table(
                {"hop": pa.array([], pa.int64()), "n_parts": pa.array([], pa.int64())}
            )
        )

    try:
        bests = [b for b in ray.get([s.seal.remote() for s in shards]) if b]
        # deterministic global seed: max degree, then smallest id
        seed = min(bests, key=lambda t: (-t[0], t[1]))[1]

        # superstep 0
        outboxes = ray.get([s.start.remote(seed) for s in shards])
        for rnd in range(1, max_rounds + 1):
            # route: shard b receives every shard's slice for b
            inbound = [
                [box[b] for box in outboxes if len(box[b])]
                for b in range(num_shards)
            ]
            if not any(inbound):
                break
            outboxes = ray.get(
                [
                    shards[b].step.remote(rnd, *inbound[b])
                    for b in range(num_shards)
                ]
            )
        else:
            raise RuntimeError(
                f"bfs_hops did not converge in {max_rounds} rounds "
                f"(graph diameter exceeds the twin's recursion bound)"
            )

        hist: dict[int, int] = {}
        for part in ray.get([s.histogram.remote() for s in shards]):
            for h, n in part.items():
                hist[h] = hist.get(h, 0) + n
    finally:
        [ray.kill(s) for s in shards]
    hops = sorted(hist)
    return rd.from_arrow(
        pa.table(
            {
                "hop": pa.array(hops, pa.int64()),
                "n_parts": pa.array([hist[h] for h in hops], pa.int64()),
            }
        )
    )


LPA_ROUNDS = 8
LPA_SHARDS = 16


@ray.remote
class _LpaShard:
    """One shard of the synchronous label-propagation index: owns the
    adjacency rows whose SOURCE endpoint hashes here (``src % S``) and the
    labels of exactly those nodes.  The adjacency loads ONCE; each round
    exchanges only label arrays (O(V) total, never the edges) via the
    object store — the same raw-actor escape hatch as `_BfsShard`.
    """

    def __init__(self, shard_id: int, num_shards: int) -> None:
        self.shard_id = shard_id
        self.num_shards = num_shards
        self._src_parts: list[np.ndarray] = []
        self._dst_parts: list[np.ndarray] = []
        self.src = np.array([], dtype=np.int64)
        self.dst = np.array([], dtype=np.int64)
        self.nodes = np.array([], dtype=np.int64)
        self.labels = np.array([], dtype=np.int64)

    def load(self, src: np.ndarray, dst: np.ndarray) -> None:
        self._src_parts.append(src)
        self._dst_parts.append(dst)

    def seal(self) -> int:
        if self._src_parts:
            src = np.concatenate(self._src_parts)
            dst = np.concatenate(self._dst_parts)
            order = np.argsort(src, kind="stable")
            self.src, self.dst = src[order], dst[order]
            self._src_parts, self._dst_parts = [], []
        self.nodes = np.unique(self.src)
        self.labels = self.nodes.copy()  # init: own id
        return len(self.nodes)

    def get_labels(self) -> tuple[np.ndarray, np.ndarray]:
        return self.nodes, self.labels

    def step(self, *label_parts) -> None:
        """One synchronous round: relabel every owned node to the most
        frequent label among its neighbors (ties → smallest label), all
        reads against the PREVIOUS round's labels."""
        if not len(self.src):
            return
        all_nodes = np.concatenate([p[0] for p in label_parts])
        all_labels = np.concatenate([p[1] for p in label_parts])
        order = np.argsort(all_nodes)
        all_nodes, all_labels = all_nodes[order], all_labels[order]
        lbl = all_labels[np.searchsorted(all_nodes, self.dst)]
        # per-src mode with (count desc, label asc) tie-break, vectorized:
        # count (src,lbl) runs, then take the first row per src after a
        # (src, -count, lbl) sort
        o = np.lexsort((lbl, self.src))
        s, l = self.src[o], lbl[o]
        new = np.concatenate([[True], (s[1:] != s[:-1]) | (l[1:] != l[:-1])])
        rs, rl = s[new], l[new]
        idx = np.nonzero(new)[0]
        cnt = np.diff(np.concatenate([idx, [len(s)]]))
        o2 = np.lexsort((rl, -cnt, rs))
        s2 = rs[o2]
        first = np.concatenate([[True], s2[1:] != s2[:-1]])
        win_src, win_lbl = s2[first], rl[o2][first]
        # win_src is sorted and equals self.nodes (every owned node has
        # at least one incident edge by construction)
        self.labels = win_lbl

    def finish(self, digest_mod: int) -> tuple[int, int, np.ndarray]:
        """(n_nodes, digest partial, distinct labels on this shard)."""
        from .interpret import row_digest

        dg = 0
        for n, l in zip(self.nodes.tolist(), self.labels.tolist()):
            dg = (dg + row_digest(str(n), str(l))) % digest_mod
        return len(self.nodes), dg, np.unique(self.labels)


def lpa_communities_digest(
    sf_dir: str,
    *,
    min_support: int = 2,
    num_buckets: int = 64,
    num_shards: int = LPA_SHARDS,
    rounds: int = LPA_ROUNDS,
) -> pa.Table:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) on the co-purchase graph — the cheap community baseline next
    to CC (which ignores edge density) and k-core (which ignores locality):
    every node adopts its neighbors' majority label each round, ties to
    the smallest label, for a FIXED ``rounds`` supersteps (fixed-round
    synchronous LPA is deterministic even when the 2-coloring oscillation
    would prevent convergence — determinism is the contract here, and the
    independent oracle runs the identical schedule).

    Scale shape: adjacency partitions once into ``num_shards`` stateful
    actors; each round moves only the O(V) label arrays between shards
    (refs routed by the driver, data never touches it); the digest folds
    on the shards.  Distinct-label arrays (≤ communities per shard) are
    the only driver pull.

    Returns one row (n_nodes, n_communities, digest) — pinned from
    `oracle_dedup.lpa_labels` (plain dict/Counter reimplementation).
    """
    from .basket import copurchase_edges
    from .interpret import DIGEST_MOD

    edges = copurchase_edges(
        sf_dir, min_support=min_support, num_buckets=num_buckets
    )
    shards = [_LpaShard.remote(i, num_shards) for i in range(num_shards)]

    def push(batch: pa.Table) -> pa.Table:
        a = batch.column("p1").to_numpy(zero_copy_only=False)
        b = batch.column("p2").to_numpy(zero_copy_only=False)
        src = np.concatenate([a, b]).astype(np.int64)
        dst = np.concatenate([b, a]).astype(np.int64)
        owner = src % num_shards
        refs = [
            shards[s].load.remote(src[owner == s], dst[owner == s])
            for s in range(num_shards)
            if (owner == s).any()
        ]
        ray.get(refs)
        return pa.table({"n": pa.array([len(src)], pa.int64())})

    edges.map_batches(push, batch_format="pyarrow").sum("n")
    ray.get([s.seal.remote() for s in shards])
    for _ in range(rounds):
        refs = [s.get_labels.remote() for s in shards]
        ray.get([s.step.remote(*refs) for s in shards])
    parts = ray.get([s.finish.remote(DIGEST_MOD) for s in shards])
    n_nodes = sum(p[0] for p in parts)
    dg = sum(p[1] for p in parts) % DIGEST_MOD
    n_comm = len(np.unique(np.concatenate([p[2] for p in parts])))
    for s in shards:
        ray.kill(s)
    return pa.table(
        {
            "n_nodes": pa.array([n_nodes], pa.int64()),
            "n_communities": pa.array([n_comm], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


HB_SHARDS = 16
HB_ROUNDS = 4


@ray.remote
class _HyperBallShard:
    """One shard of the HyperBall neighborhood-function estimator (Boldi,
    Rosa & Vigna 2011): owns the adjacency rows whose SOURCE endpoint
    hashes here (``src % S``) and a (V_own, HB_M) uint8 register matrix —
    one 128-byte HLL per owned node.  Each round every node's sketch
    becomes the elementwise max of itself and its neighbors' sketches
    (ball radius +1); the exchange moves only the O(V·m) register
    matrices, never the edges — exactly HyperBall's documented cost
    model, and the same raw-actor escape hatch as `_LpaShard`."""

    def __init__(self, shard_id: int, num_shards: int) -> None:
        self.shard_id = shard_id
        self.num_shards = num_shards
        self._src_parts: list[np.ndarray] = []
        self._dst_parts: list[np.ndarray] = []
        self.src = np.array([], dtype=np.int64)
        self.dst = np.array([], dtype=np.int64)
        self.nodes = np.array([], dtype=np.int64)
        self.regs = np.zeros((0, 0), dtype=np.uint8)

    def load(self, src: np.ndarray, dst: np.ndarray) -> None:
        self._src_parts.append(src)
        self._dst_parts.append(dst)

    def seal(self) -> int:
        from ..functions.sketch import HB_M, hb_node_register

        if self._src_parts:
            src = np.concatenate(self._src_parts)
            dst = np.concatenate(self._dst_parts)
            order = np.argsort(src, kind="stable")
            self.src, self.dst = src[order], dst[order]
            self._src_parts, self._dst_parts = [], []
        self.nodes = np.unique(self.src)
        self.regs = np.zeros((len(self.nodes), HB_M), dtype=np.uint8)
        for i, n in enumerate(self.nodes.tolist()):
            idx, rank = hb_node_register(n)
            self.regs[i, idx] = rank
        return len(self.nodes)

    def get_regs(self) -> tuple[np.ndarray, np.ndarray]:
        return self.nodes, self.regs

    def step(self, *reg_parts) -> None:
        """One radius increment: own regs ∨= max over neighbor regs, all
        reads against the previous round's registers."""
        if not len(self.src):
            return
        all_nodes = np.concatenate([p[0] for p in reg_parts])
        all_regs = np.concatenate([p[1] for p in reg_parts], axis=0)
        order = np.argsort(all_nodes)
        all_nodes, all_regs = all_nodes[order], all_regs[order]
        nbr = all_regs[np.searchsorted(all_nodes, self.dst)]
        starts = np.concatenate(
            [[0], np.nonzero(self.src[1:] != self.src[:-1])[0] + 1]
        )
        folded = np.maximum.reduceat(nbr, starts, axis=0)
        # self.src's distinct values ARE self.nodes (sorted): rows align
        np.maximum(self.regs, folded, out=self.regs)

    def reach(self) -> int:
        """Σ over owned nodes of the rounded-integer ball-size estimate —
        integer partials, so the driver fold is order-free."""
        from ..functions.sketch import hb_estimate_rows

        if not len(self.nodes):
            return 0
        return int(hb_estimate_rows(self.regs).sum())


def hyperball_reach(
    sf_dir: str,
    *,
    min_support: int = 2,
    num_buckets: int = 64,
    num_shards: int = HB_SHARDS,
    rounds: int = HB_ROUNDS,
) -> pa.Table:
    """The NEIGHBORHOOD FUNCTION of the co-purchase graph via HyperBall:
    N(t) = estimated number of (u, v) pairs with dist(u, v) ≤ t, for
    t = 0..rounds — the distance-distribution summary behind effective-
    diameter estimates, computed without any all-pairs BFS.

    Per-node 128-byte HLL sketches (spec in `functions.sketch`:
    ``HB_P/HB_M/HB_ALPHA/hb_node_register``) initialized to {self}, then
    ``rounds`` synchronous max-merge supersteps over the symmetric edge
    set; after each step N(t) = Σ_u round(estimate(ball_u)) — per-node
    rounded INTEGER estimates, so every fold (shard partials, driver sum)
    is exact and order-free.  Fixed-round schedule like LPA: determinism
    is the contract, and `oracle_dedup.hyperball_rows` (plain-dict
    sequential twin, identical register spec) pins the digest.

    Returns (t, reach_pairs) for t in 0..rounds.
    """
    from .basket import copurchase_edges

    edges = copurchase_edges(sf_dir, min_support=min_support, num_buckets=num_buckets)
    shards = [_HyperBallShard.remote(i, num_shards) for i in range(num_shards)]

    def push(batch: pa.Table) -> pa.Table:
        a = batch.column("p1").to_numpy(zero_copy_only=False)
        b = batch.column("p2").to_numpy(zero_copy_only=False)
        src = np.concatenate([a, b]).astype(np.int64)
        dst = np.concatenate([b, a]).astype(np.int64)
        owner = src % num_shards
        refs = [
            shards[s].load.remote(src[owner == s], dst[owner == s])
            for s in range(num_shards)
            if (owner == s).any()
        ]
        ray.get(refs)
        return pa.table({"n": pa.array([len(src)], pa.int64())})

    edges.map_batches(push, batch_format="pyarrow").sum("n")
    ray.get([s.seal.remote() for s in shards])
    ts = [0]
    reach = [sum(ray.get([s.reach.remote() for s in shards]))]
    for t in range(1, rounds + 1):
        refs = [s.get_regs.remote() for s in shards]
        ray.get([s.step.remote(*refs) for s in shards])
        ts.append(t)
        reach.append(sum(ray.get([s.reach.remote() for s in shards])))
    for s in shards:
        ray.kill(s)
    return pa.table(
        {
            "t": pa.array(ts, pa.int64()),
            "reach_pairs": pa.array(reach, pa.int64()),
        }
    )


def hyperball_digest(sf_dir: str) -> pa.Table:
    """Digest gate over `hyperball_reach`: (n_rounds, digest) — md5 fold
    over (t, reach_pairs) rows, pinned from `oracle_dedup.hyperball_rows`."""
    from .interpret import DIGEST_MOD, row_digest

    t = hyperball_reach(sf_dir)
    dg = 0
    for tt, rp in zip(t.column("t").to_pylist(), t.column("reach_pairs").to_pylist()):
        dg = (dg + row_digest(str(tt), str(rp))) % DIGEST_MOD
    return pa.table(
        {
            "n_rounds": pa.array([t.num_rows - 1], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )


BC_PIVOTS = 8
BC_GRID = 1 << 30  # δ quantization: contributions become exact integers


def betweenness_digest(
    sf_dir: str,
    *,
    min_support: int = 2,
    num_buckets: int = 64,
    num_pivots: int = BC_PIVOTS,
) -> pa.Table:
    """Pivot-sampled betweenness centrality (Brandes 2001 with a fixed
    deterministic pivot set — the ``num_pivots`` smallest node ids) on
    the co-purchase graph: B[v] = Σ over pivots of the dependency δ_s(v).

    Exactness spec (what makes an inherently-float centrality
    digest-gateable): per-edge dependency contributions quantize ONCE to
    ``round_even((σ_v/σ_w)·(1 + δ_w/2^30)·2^30)`` — δ lives on the
    2^30 integer grid, so every accumulation (per node, per pivot, the
    cross-pivot sum) is an order-free exact integer; σ path counts are
    exact int64 (documented bound σ < 2^63, astronomically above any
    non-adversarial graph at gate scale).

    Distribution axis: pivots are embarrassingly parallel — the
    adjacency CSR broadcasts once via ``ray.put`` and each pivot's
    Brandes runs as one task (`map_batches` over the pivot list), the
    standard "graph fits in a worker, parallelize over sources" regime;
    for graphs beyond single-node RAM the `bfs_hops`/`_LpaShard` Pregel
    shards are the documented alternative.  Per-pivot (node, δ_q) rows
    fold in ONE node-keyed aggregate; the digest folds distributed
    (`interpret.fold_digest`).  Returns (n_nodes, n_pivots, digest) —
    pinned from `oracle_dedup.betweenness_rows` (plain dict/list BFS
    reimplementation, same grid spec).
    """
    from ray.data.aggregate import Sum

    from .basket import copurchase_edges
    from .interpret import fold_digest

    edges = copurchase_edges(sf_dir, min_support=min_support, num_buckets=num_buckets)
    rows = edges.take_all()  # graph-sized: the broadcast-regime trade
    empty = pa.table(
        {
            "n_nodes": pa.array([0], pa.int64()),
            "n_pivots": pa.array([0], pa.int64()),
            "digest": pa.array([0], pa.int64()),
        }
    )
    if not rows:
        return empty
    a = np.array([r["p1"] for r in rows], dtype=np.int64)
    b = np.array([r["p2"] for r in rows], dtype=np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    nodes = np.unique(src)
    nid = {int(v): i for i, v in enumerate(nodes.tolist())}
    si = np.fromiter((nid[int(v)] for v in src), dtype=np.int64, count=len(src))
    di = np.fromiter((nid[int(v)] for v in dst), dtype=np.int64, count=len(dst))
    order = np.lexsort((di, si))
    si, di = si[order], di[order]
    indptr = np.searchsorted(si, np.arange(len(nodes) + 1))
    adj_ref = ray.put((nodes, indptr, di))
    pivots = [int(v) for v in nodes[:num_pivots].tolist()]

    def brandes(batch: pa.Table) -> pa.Table:
        from ..pipelines.joins import _get_broadcast

        nodes_, indptr_, di_ = _get_broadcast(adj_ref)
        n = len(nodes_)
        out_node: list[int] = []
        out_dq: list[int] = []
        for pv in batch.column("pivot").to_pylist():
            s = int(np.searchsorted(nodes_, pv))
            dist = np.full(n, -1, dtype=np.int64)
            sigma = np.zeros(n, dtype=np.int64)
            dist[s], sigma[s] = 0, 1
            levels = [[s]]
            frontier = np.array([s], dtype=np.int64)
            while len(frontier):
                nxt_set: dict[int, None] = {}
                for v in frontier.tolist():
                    for w in di_[indptr_[v] : indptr_[v + 1]].tolist():
                        if dist[w] == -1:
                            dist[w] = dist[v] + 1
                            nxt_set[w] = None
                        if dist[w] == dist[v] + 1:
                            sigma[w] += sigma[v]
                    # σ adds are exact int64 (documented bound)
                frontier = np.array(sorted(nxt_set), dtype=np.int64)
                if len(frontier):
                    levels.append(frontier.tolist())
            dq = np.zeros(n, dtype=np.int64)
            for lvl in reversed(levels[:-1]):
                for v in lvl:
                    acc = 0
                    for w in di_[indptr_[v] : indptr_[v + 1]].tolist():
                        if dist[w] == dist[v] + 1:
                            t = (
                                (float(sigma[v]) / float(sigma[w]))
                                * (1.0 + float(dq[w]) / BC_GRID)
                                * BC_GRID
                            )
                            acc += int(np.round(t))
                    dq[v] = acc
            nz = np.nonzero(dq)[0]
            for i in nz.tolist():
                if i != s:
                    out_node.append(int(nodes_[i]))
                    out_dq.append(int(dq[i]))
        return pa.table(
            {
                "node": pa.array(out_node, pa.int64()),
                "delta_q": pa.array(out_dq, pa.int64()),
            }
        )

    piv_ds = rd.from_arrow(pa.table({"pivot": pa.array(pivots, pa.int64())}))
    bc = (
        piv_ds.repartition(len(pivots))
        .map_batches(brandes, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("delta_q", alias_name="b_q"))
    )

    def payload(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table(
            {
                "doc_id": batch.column("node"),
                "payload": _pc.cast(batch.column("b_q"), pa.string()),
            }
        )

    dg = fold_digest(bc.map_batches(payload, batch_format="pyarrow"), "payload")
    return pa.table(
        {
            "n_nodes": pa.array([len(nodes)], pa.int64()),
            "n_pivots": pa.array([len(pivots)], pa.int64()),
            "digest": dg.column("digest"),
        }
    )


# --- k-truss decomposition ---------------------------------------------------
KTRUSS_K = 3  # 4-truss is empty at gate scale; 3 = every edge in a triangle
KTRUSS_MAX_ROUNDS = 30


def ktruss_edges(
    sf_dir: str,
    *,
    k: int = KTRUSS_K,
    min_support: int = 2,
    num_buckets: int = 64,
    max_rounds: int = KTRUSS_MAX_ROUNDS,
) -> rd.Dataset:
    """Maximal k-truss of the co-purchase graph (Cohen 2008, public): the
    unique largest subgraph where EVERY edge closes ≥ k−2 triangles — the
    community-core detector one level stronger than `kcore_members`
    (cores bound degrees; trusses bound cohesion).

    Iterative edge peeling, each round three co-partition shuffles (the
    `triangle_count` node-iterator machinery with the apex carried so a
    closed wedge credits all THREE of its edges):

    1. wedge generation per low-endpoint bucket (degree-size-class triu);
    2. wedge close per (b, c) hash bucket → support partials for the
       edges (a,b), (a,c), (b,c) of each closed triangle;
    3. per-edge support fold → drop edges with support < k−2.

    Rounds repeat until the edge count is a fixed point (a driver scalar
    per round — the `connected_components` convergence-witness
    contract; raises after ``max_rounds``).  The result is ORDER-FREE:
    the maximal k-truss is unique, so peeling order cannot matter.
    Returns the surviving (p1, p2) edges sorted; digest-gated via
    `ktruss_digest`, pinned from `oracle_dedup.ktruss_rows`.
    """
    from .basket import copurchase_edges

    _PRIME = np.int64(1_000_003)
    need = k - 2
    edges = copurchase_edges(
        sf_dir, min_support=min_support, num_buckets=num_buckets
    ).materialize()
    n_prev = edges.count()
    if n_prev == 0:
        return edges.sort(["p1", "p2"])

    def abucket(batch: pa.Table) -> pa.Table:
        a = batch.column("p1").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "abkt", pa.array((a % num_buckets).astype(np.int64))
        )

    def wedges_of(group: pa.Table) -> pa.Table:
        """Wedge rows (b, c, apex a) + edge-presence rows (b, c, a=-1)."""
        empty = pa.table(
            {
                "wbkt": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                "a": pa.array([], pa.int64()),
            }
        )
        a = group.column("p1").combine_chunks().to_numpy(zero_copy_only=False)
        nb = group.column("p2").combine_chunks().to_numpy(zero_copy_only=False)
        if not len(a):
            return empty
        order = np.lexsort((nb, a))
        av, nbv = a[order], nb[order]
        verts, deg = np.unique(av, return_counts=True)
        starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
        b_all, c_all, a_all = [], [], []
        for d in np.unique(deg):
            if d < 2:
                continue
            sel = np.nonzero(deg == d)[0]
            idx = starts[sel][:, None] + np.arange(d)[None, :]
            nbr = nbv[idx]
            iu, ju = np.triu_indices(int(d), 1)
            b_all.append(nbr[:, iu].ravel())
            c_all.append(nbr[:, ju].ravel())
            a_all.append(np.repeat(verts[sel], len(iu)))
        parts = [empty]
        if b_all:
            b = np.concatenate(b_all)
            c = np.concatenate(c_all)
            ap = np.concatenate(a_all)
            parts.append(
                pa.table(
                    {
                        "wbkt": pa.array(
                            ((b * _PRIME + c) % num_buckets).astype(np.int64)
                        ),
                        "b": pa.array(b),
                        "c": pa.array(c),
                        "a": pa.array(ap),
                    }
                )
            )
        parts.append(
            pa.table(
                {
                    "wbkt": pa.array(((a * _PRIME + nb) % num_buckets).astype(np.int64)),
                    "b": pa.array(a),
                    "c": pa.array(nb),
                    "a": pa.array(np.full(len(a), -1, np.int64)),
                }
            )
        )
        return pa.concat_tables(parts)

    def close_to_support(group: pa.Table) -> pa.Table:
        """Support partials: each closed wedge (a; b, c) credits edges
        (a,b), (a,c), (b,c) — keyed by each edge's own bucket."""
        b = group.column("b").combine_chunks().to_numpy(zero_copy_only=False)
        c = group.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        ap = group.column("a").combine_chunks().to_numpy(zero_copy_only=False)
        ise = ap == -1
        empty = pa.table(
            {
                "ebkt": pa.array([], pa.int64()),
                "p1": pa.array([], pa.int64()),
                "p2": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            }
        )
        if ise.all() or not ise.any():
            return empty
        maxc = int(c.max()) + 1
        key = b * maxc + c
        closed = np.isin(key[~ise], key[ise])
        wb, wc, wa = b[~ise][closed], c[~ise][closed], ap[~ise][closed]
        if not len(wb):
            return empty
        # edges of the triangle (a < b < c by construction): (a,b) (a,c) (b,c)
        p1 = np.concatenate([wa, wa, wb])
        p2 = np.concatenate([wb, wc, wc])
        return pa.table(
            {
                "ebkt": pa.array(((p1 * _PRIME + p2) % num_buckets).astype(np.int64)),
                "p1": pa.array(p1),
                "p2": pa.array(p2),
                "s": pa.array(np.ones(len(p1), np.int64)),
            }
        )

    def keep_supported(group: pa.Table) -> pa.Table:
        p1 = group.column("p1").combine_chunks().to_numpy(zero_copy_only=False)
        p2 = group.column("p2").combine_chunks().to_numpy(zero_copy_only=False)
        maxp = int(p2.max()) + 1 if len(p2) else 1
        key = p1 * maxp + p2
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.zeros(len(uk), np.int64)
        np.add.at(tot, inv, group.column("s").combine_chunks().to_numpy(zero_copy_only=False))
        ok = tot >= need
        return pa.table(
            {
                "p1": pa.array((uk[ok] // maxp).astype(np.int64)),
                "p2": pa.array((uk[ok] % maxp).astype(np.int64)),
            }
        )

    for _ in range(max_rounds):
        support = (
            edges.map_batches(abucket, batch_format="pyarrow")
            .groupby("abkt")
            .map_groups(wedges_of, batch_format="pyarrow")
            .groupby("wbkt")
            .map_groups(close_to_support, batch_format="pyarrow")
            .groupby("ebkt")
            .map_groups(keep_supported, batch_format="pyarrow")
            .materialize()
        )
        n_now = support.count()
        if n_now == n_prev:
            return support.sort(["p1", "p2"])
        edges, n_prev = support, n_now
        if n_prev == 0:
            return edges.sort(["p1", "p2"])
    raise RuntimeError(f"k-truss peeling did not converge in {max_rounds} rounds")


def ktruss_digest(sf_dir: str, **kwargs) -> pa.Table:
    """Digest gate over `ktruss_edges`: (n_edges, digest), pinned from the
    independent sequential `oracle_dedup.ktruss_rows`."""
    from ..pipelines.interpret import DIGEST_MOD, row_digest

    rows = ktruss_edges(sf_dir, **kwargs).take_all()
    dg = 0
    for r in rows:
        dg = (dg + row_digest(str(r["p1"]), str(r["p2"]))) % DIGEST_MOD
    return pa.table(
        {
            "n_edges": pa.array([len(rows)], pa.int64()),
            "digest": pa.array([dg], pa.int64()),
        }
    )
